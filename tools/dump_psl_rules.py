#!/usr/bin/env python3
"""Dump the vendored Mozilla PSL (ICANN section) as a flat rule table CSV
for the q19b DuckDB oracle: kind in {exact, wildcard, exception}; wildcard
rules stored as their parent (``*.ck`` -> ``ck``), exceptions stripped of
``!``. Mirrors DomainParse.scala's parse of the same file exactly — the
oracle then replays the generic PSL longest-match algorithm in SQL, so a
drift in either parser fails the hash compare. Derived from public Mozilla
data (MPL-2.0), same attribution as the vendored .dat.

Usage: python3 tools/dump_psl_rules.py   (rewrites tools/psl_rules_icann.csv)
"""
import os

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
dat = os.path.join(root, "src/main/resources/graft/public_suffix_list.dat")
out = os.path.join(root, "tools/psl_rules_icann.csv")

lines = open(dat, encoding="utf-8").read().splitlines()
beg = next(i for i, l in enumerate(lines) if "===BEGIN ICANN DOMAINS===" in l)
end = next(i for i, l in enumerate(lines) if "===END ICANN DOMAINS===" in l)
rules = [l.strip().lower() for l in lines[beg:end]
         if l.strip() and not l.strip().startswith("//")]

with open(out, "w", encoding="utf-8") as f:
    f.write("kind,rule\n")
    for r in rules:
        if r.startswith("*."):
            f.write(f"wildcard,{r[2:]}\n")
        elif r.startswith("!"):
            f.write(f"exception,{r[1:]}\n")
        else:
            f.write(f"exact,{r}\n")
print(f"wrote {out}: {len(rules)} rules")
