"""One-command bracket sweep (VERDICT r4 next-round #8): replay the full
oracle suite at every available scale bracket and print the pass table
SCALE.md used to describe as a manual procedure.

Brackets: /root/testdata/sf{0.001,0.01,0.1} always; /tmp/sf1 when it
exists (regenerate with `python tools/gen_sf1.py`).

Usage: python tools/check_all_brackets.py [name ...]
Exit 0 iff every query passes at every bracket.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_oracle import compare, duck_con  # noqa: E402

BRACKETS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    "/tmp/sf1",
]


def main():
    names_arg = sys.argv[1:]
    # Extra bracket dirs (e.g. /tmp/sf10 from tools/gen_sfn.py) come in
    # via env so positional args stay query names.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_BRACKETS", "")
    for b in filter(None, extra.split(":")):
        if b not in BRACKETS:
            BRACKETS.append(b)

    import __spark_entry__ as entry
    from bigartm_spark.session import get_spark

    spark = get_spark("check-brackets")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entry.queries(), entry.oracle_sql()
    names = names_arg or list(qs)
    brackets = [b for b in BRACKETS if os.path.isdir(b)]
    print(f"brackets: {', '.join(brackets)}\n")

    results: dict[str, dict[str, str]] = {n: {} for n in names}
    totals = {b: [0, 0] for b in brackets}  # passed, ran
    t_start = time.time()
    for b in brackets:
        con = duck_con(b)
        for name in names:
            totals[b][1] += 1
            try:
                sp = qs[name](spark, b).toPandas()
            except Exception as e:
                results[name][b] = f"SPARK-ERR {type(e).__name__}"
                continue
            if name not in oracles:
                results[name][b] = f"rows={len(sp)}"
                totals[b][0] += 1
                continue
            try:
                du = con.execute(oracles[name]).fetchdf()
            except Exception as e:
                results[name][b] = f"DUCK-ERR {type(e).__name__}"
                continue
            problems = compare(sp, du)
            if problems:
                results[name][b] = "FAIL " + problems[0][:60]
            else:
                results[name][b] = "ok"
                totals[b][0] += 1
        con.close()

    short = {b: b.rstrip("/").rsplit("/", 1)[-1] for b in brackets}
    width = max(len(n) for n in names) + 2
    header = "query".ljust(width) + "".join(
        short[b].ljust(12) for b in brackets
    )
    print(header)
    print("-" * len(header))
    any_fail = False
    for name in names:
        row = name.ljust(width)
        for b in brackets:
            cell = results[name].get(b, "-")
            if cell not in ("ok",) and not cell.startswith("rows="):
                any_fail = True
            row += cell.ljust(12)
        print(row)
    print("-" * len(header))
    line = "TOTAL".ljust(width)
    for b in brackets:
        p, r = totals[b]
        line += f"{p}/{r}".ljust(12)
    print(line)
    print(f"\nwall: {time.time() - t_start:.0f}s")
    sys.exit(1 if any_fail else 0)


if __name__ == "__main__":
    main()
