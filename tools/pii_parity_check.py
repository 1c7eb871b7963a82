#!/usr/bin/env python3
"""DuckDB-side PII parity check at NONZERO incidence.

The driver's oracle compare only ever sees the PII-free synthetic
corpus (counts 0, identity redaction), so an RE2-vs-java.util.regex
divergence in the PiiOps patterns would be invisible to it. This tool
pins the DuckDB side of the parity claim against the SAME golden
expectations PiiOpsSpec pins the Spark side to: the crafted inputs
below are copied verbatim from PiiOpsSpec, and the patterns/replacement
order are parsed out of PiiOps.scala so the two cannot drift.

Run: python3 tools/pii_parity_check.py   (exits nonzero on mismatch)
"""
import re
import sys
import duckdb

SRC = "src/main/scala/graft/operators/PiiOps.scala"

def load_patterns(path=SRC):
    text = open(path).read()
    block = text.split("val Patterns", 1)[1].split("def countCols", 1)[0]
    pats = re.findall(
        r'\("(\w+)",\s*"""(.*?)""",\s*"(<[A-Z]+>)"\)', block, re.S)
    assert len(pats) == 5, f"expected 5 patterns, parsed {len(pats)}"
    return pats

# (doc_id, text, per-class golden counts, golden redaction) — must stay
# in lockstep with PiiOpsSpec's `crafted`/expected values.
CASES = [
    (1, "contact alice@example.com or bob.smith+x@corp.co.uk now",
     dict(email=2), "contact <EMAIL> or <EMAIL> now"),
    (2, "server 192.168.1.1 and 10.0.0.255 version v1.2.3.4",
     dict(ipv4=2), "server <IP> and <IP> version v1.2.3.4"),
    (3, "call 555-123-4567 or 555.987.6543 today",
     dict(phone=2), "call <PHONE> or <PHONE> today"),
    (4, "ssn 123-45-6789 card 4111111111111111 done",
     dict(ssn=1, card=1), "ssn <SSN> card <CARD> done"),
    (5, "a perfectly clean document with no identifiers",
     dict(), "a perfectly clean document with no identifiers"),
    (6, "mixed bob@corp.io at 10.0.0.1 dial 800-555-1234",
     dict(email=1, ipv4=1, phone=1), "mixed <EMAIL> at <IP> dial <PHONE>"),
    (7, "mail 1.2.3.4a@example.com then 5.6.7.8 stop",
     dict(email=1, ipv4=1), "mail <EMAIL> then <IP> stop"),
]

def main():
    pats = load_patterns()
    con = duckdb.connect()
    failures = 0
    for doc_id, text, want_counts, want_red in CASES:
        for name, pat, _ in pats:
            got = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [text, pat]).fetchone()[0]
            want = want_counts.get(name, 0)
            if got != want:
                print(f"FAIL doc {doc_id} count[{name}]: duckdb={got} want={want}")
                failures += 1
        red = text
        for _, pat, repl in pats:
            red = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [red, pat, repl]).fetchone()[0]
        if red != want_red:
            print(f"FAIL doc {doc_id} redaction:\n  duckdb: {red}\n  want:   {want_red}")
            failures += 1
    n = len(CASES) * (len(pats) + 1)
    print(f"{n - failures}/{n} pii parity checks pass (DuckDB/RE2 side, nonzero incidence)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
