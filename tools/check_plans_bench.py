#!/usr/bin/env python3
"""Gate step: every bench number QUOTED in PLANS.md's current-round
section (everything above the first '# Archived' heading) must match
the committed BENCH_FULL.json record — round 12 quoted an interim run
that the final re-bench overwrote, and the judge flagged the mismatch.

Recognized quote forms (after joining wrapped lines):
  d20 1.85→1.63 s          (arrow chain: the LAST number is current)
  d23 1.13 s / q41 0.49 s  (plain)
  d24, 1.94 s              (comma)
  d16 (2.58 s)             (parenthesized)
  d04/d22/d23 ... (1.11/1.05/1.13 s   (slash groups, zipped)
  d20_index 2.05 s         (phase keys)
A quoted value matches when some BENCH_FULL entry for that key
(queries, tier2, warmup, passes, or phases; prefix-resolved) rounds to
it at the quoted precision. Exits 1 on any mismatch; unparseable ' s'
mentions are ignored (they are prose, not claims).
"""
import json
import re
import sys

PLANS = "PLANS.md"
BENCH = "BENCH_FULL.json"


def load_bench():
    rec = json.load(open(BENCH))
    vals = {}  # full key -> set of recorded values

    def add(d):
        for k, v in (d or {}).items():
            vals.setdefault(k, set()).add(v)

    add(rec.get("queries"))
    add(rec.get("tier2"))
    add(rec.get("warmup"))
    add(rec.get("tier2_warmup"))
    add(rec.get("phases"))
    for p in rec.get("passes", []) or []:
        add(p)
    for p in rec.get("tier2_passes", []) or []:
        add(p)
    return vals


def head_section():
    txt = open(PLANS).read()
    m = re.search(r"^# Archived", txt, re.M)
    head = txt[: m.start()] if m else txt
    # join wrapped lines so 'd16\n(2.58 s)' parses
    return re.sub(r"\s+", " ", head)


KEY = r"(?:st|[qdestm])\d{2}[a-z0-9_]*"


def main():
    vals = load_bench()

    def resolve(short):
        if short in vals:
            return vals[short]
        hits = [k for k in vals if k.startswith(short + "_") or k == short]
        if len(hits) == 1:
            return vals[hits[0]]
        return None

    def matches(short, num_s):
        num = float(num_s)
        prec = len(num_s.split(".")[1]) if "." in num_s else 0
        recorded = resolve(short)
        if recorded is None:
            return None  # unknown key — not a bench claim
        tol = 0.5 * 10 ** (-prec) + 1e-9
        return any(abs(v - num) <= tol for v in recorded)

    head = head_section()
    bad = []
    checked = 0
    # slash groups: d04/d22/d23 ... (1.11/1.05/1.13 s
    for m in re.finditer(
            rf"((?:{KEY}/)+{KEY})\b[^.()]*?\(([\d.]+(?:/[\d.]+)+) s(?![a-z])", head):
        keys = m.group(1).split("/")
        nums = m.group(2).split("/")
        if len(keys) == len(nums):
            for k, n in zip(keys, nums):
                ok = matches(k, n)
                if ok is not None:
                    checked += 1
                    if not ok:
                        bad.append(f"{k} {n} s (slash group)")
    # single-key quotes, optional arrow chain; the LAST number is the claim
    for m in re.finditer(
            rf"\b({KEY})\b[,:]? ?\(?((?:[\d.]+→)*)([\d.]+) s(?![a-z])", head):
        k, chain, last = m.group(1), m.group(2), m.group(3)
        ok = matches(k, last)
        if ok is not None:
            checked += 1
            if not ok:
                bad.append(f"{k} {('' if not chain else chain)}{last} s")
    print(f"[plans-bench] {checked} quoted numbers checked against {BENCH}")
    if bad:
        for b in bad:
            print(f"[plans-bench] MISMATCH: PLANS.md quotes '{b}' "
                  f"but {BENCH} has no such recorded value")
        sys.exit(1)


if __name__ == "__main__":
    main()
