"""One-command bracket sweep (VERDICT r4 next-round #8): replay the full
oracle suite at every available scale bracket and print the pass table
SCALE.md used to describe as a manual procedure.

Brackets: /root/testdata/sf{0.001,0.01,0.1} always; /tmp/sf1 when it
exists (regenerate with `python tools/gen_sf1.py`). Extra brackets (e.g.
/tmp/sf10 from tools/gen_sfn.py) via --sf or $SPARK_GRAFT_EXTRA_BRACKETS.

--light mode (VERDICT r6 next-round #4): at big brackets the ORACLE's EM
replicas blow up long before the Spark side does. --light still runs
every Spark query (asserting success + row count), but gives each DuckDB
oracle a per-query budget (--oracle-timeout, default 120s, enforced via
con.interrupt()); a query whose oracle exceeds the budget records
"rows-only" instead of failing, and the summary separates hash-verified
from rows-only counts. This turns "correct as far as the oracle can
follow" into a mechanical, re-runnable claim.

--budget M (VERDICT r7 next-round #7): wall-clock-bounded sweep for the
per-round sf10 refresh. Implies --light, rotates the query order by
--rotate (default: day-of-year, so successive rounds cover different
prefixes), and stops LAUNCHING new queries once M minutes have elapsed
— already-run queries keep their verdicts, the rest record
"skip(budget)" (not a failure). The bound is HARD: an in-flight Spark
query is cancelled (cancelAllJobs) at 1.2x the budget + 60s grace and
recorded skip(budget), so one heavy row can't double the sweep. A
PER-QUERY cap (--max-query-seconds, default budget/3) additionally
cancels any single slow query and moves on (skip(slow)) so an unlucky
rotation start (e.g. the 53-min SemDeDup row) can't consume the whole
window verifying nothing. A typical invocation:

    python tools/check_all_brackets.py --only-sf --sf /tmp/sf10 --budget 25

Usage: python tools/check_all_brackets.py [--light] [--sf DIR] [name ...]
Exit 0 iff every query passes (hash or rows-only) at every bracket.
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
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


def run_oracle(con, sql: str, timeout_s: float | None):
    """Execute an oracle query with an interrupt-based budget.
    Returns (df, status) with status in {'ok', 'timeout', 'error'}."""
    if timeout_s is None:
        try:
            return con.execute(sql).fetchdf(), "ok"
        except Exception:
            return None, "error"
    timed_out = threading.Event()

    def interrupt():
        timed_out.set()
        con.interrupt()

    timer = threading.Timer(timeout_s, interrupt)
    timer.start()
    try:
        df = con.execute(sql).fetchdf()
        return df, "ok"
    except Exception:
        return None, "timeout" if timed_out.is_set() else "error"
    finally:
        timer.cancel()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument(
        "--sf", action="append", default=[],
        help="extra bracket dir(s); with --only-sf, the only bracket(s)",
    )
    ap.add_argument(
        "--only-sf", action="store_true",
        help="run just the --sf bracket(s), skip the standard ladder",
    )
    ap.add_argument(
        "--light", action="store_true",
        help="per-query oracle budget; over-budget oracles degrade to "
        "a rows-only check instead of failing",
    )
    ap.add_argument("--oracle-timeout", type=float, default=120.0)
    ap.add_argument(
        "--budget", type=float, default=None, metavar="MINUTES",
        help="wall-clock budget: implies --light, rotates the query "
        "order, stops launching new queries past the budget",
    )
    ap.add_argument(
        "--rotate", type=int, default=None,
        help="query-order rotation offset for --budget sweeps "
        "(default: day-of-year, so rounds cover different subsets)",
    )
    ap.add_argument(
        "--max-query-seconds", type=float, default=None,
        help="budget mode: cancel any single Spark query past this and "
        "move on (skip(slow)) instead of letting one heavy row consume "
        "the whole window; default budget/3",
    )
    ap.add_argument(
        "--hash-cap", type=int, default=2_000_000,
        help="light mode: results above this row count record a "
        "rows-match check instead of a driver-side value hash",
    )
    args = ap.parse_args()
    if args.budget is not None:
        args.light = True
        if args.max_query_seconds is None:
            args.max_query_seconds = args.budget * 60.0 / 3.0

    brackets = [] if args.only_sf else list(BRACKETS)
    extra = os.environ.get("SPARK_GRAFT_EXTRA_BRACKETS", "")
    for b in list(filter(None, extra.split(":"))) + args.sf:
        if b not in brackets:
            brackets.append(b)

    import __spark_entry__ as entry
    from bigartm_spark.session import get_spark

    spark = get_spark("check-brackets")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entry.queries(), entry.oracle_sql()
    names = args.names or list(qs)
    if args.budget is not None:
        rot = args.rotate
        if rot is None:
            rot = time.localtime().tm_yday  # varies per round by default
        rot %= len(names)
        names = names[rot:] + names[:rot]
        print(f"budget: {args.budget:.0f} min, rotation offset {rot}")
    brackets = [b for b in brackets if os.path.isdir(b)]
    mode = (
        f"light (oracle budget {args.oracle_timeout:.0f}s/query)"
        if args.light
        else "full"
    )
    print(f"brackets: {', '.join(brackets)}  mode: {mode}\n")

    results: dict[str, dict[str, str]] = {n: {} for n in names}
    # per bracket: [hash-verified, rows-only, ran]
    totals = {b: [0, 0, 0] for b in brackets}
    t_start = time.time()
    budget_s = args.budget * 60.0 if args.budget is not None else None

    def spark_deadline_timer():
        """HARD budget: a query already in flight when the budget
        expires is cancelled (sc.cancelAllJobs) rather than allowed to
        overrun the wall bound — at sf10 a single heavy row (SemDeDup
        ran 53 min in the r7 manual sweep) would otherwise double the
        'bounded' sweep. A tighter PER-QUERY cap (--max-query-seconds)
        cancels just the one slow query and lets the window keep
        covering the rest (the r8 offset-49 window burned all 25 min on
        SemDeDup alone and verified nothing). Returns
        (timer, fired_event, reason) or (None, None, None)."""
        if budget_s is None:
            return None, None, None
        remaining = budget_s * 1.2 + 60 - (time.time() - t_start)
        reason = "budget"
        if (
            args.max_query_seconds is not None
            and args.max_query_seconds < remaining
        ):
            remaining = args.max_query_seconds
            reason = "slow"
        fired = threading.Event()

        def cancel():
            fired.set()
            spark.sparkContext.cancelAllJobs()

        timer = threading.Timer(max(remaining, 1.0), cancel)
        timer.start()
        return timer, fired, reason

    for b in brackets:
        con = duck_con(b)
        for name in names:
            if budget_s is not None and time.time() - t_start > budget_s:
                results[name][b] = "skip(budget)"
                continue
            totals[b][2] += 1
            t_q = time.time()
            timer, fired, skip_reason = spark_deadline_timer()
            try:
                df = qs[name](spark, b)
                if args.light:
                    # big brackets: assert success + row count WITHOUT a
                    # driver collect (a full theta/doc-level result at
                    # sf10 exceeds spark.driver.maxResultSize); collect
                    # only if the oracle finishes and the result is
                    # hash-comparable-sized
                    sp_count, sp = df.count(), None
                else:
                    sp = df.toPandas()
                    sp_count = len(sp)
            except Exception as e:
                if fired is not None and fired.is_set():
                    results[name][b] = f"skip({skip_reason})"
                    totals[b][2] -= 1
                else:
                    results[name][b] = f"SPARK-ERR {type(e).__name__}"
                continue
            finally:
                if timer is not None:
                    timer.cancel()
            sp_secs = time.time() - t_q
            if name not in oracles:
                results[name][b] = f"rows={sp_count}"
                totals[b][1] += 1
                continue
            du, status = run_oracle(
                con, oracles[name],
                args.oracle_timeout if args.light else None,
            )
            if status == "timeout":
                # oracle over budget: Spark side already succeeded
                results[name][b] = f"rows-only={sp_count} ({sp_secs:.0f}s)"
                totals[b][1] += 1
                continue
            if status == "error":
                results[name][b] = "DUCK-ERR"
                continue
            if sp is None:
                if len(du) != sp_count:
                    results[name][b] = (
                        f"FAIL rowcount {sp_count} vs {len(du)}"
                    )
                    continue
                if len(du) > args.hash_cap:
                    # both engines agree on a multi-million-row count;
                    # a driver-side value hash at this size is what the
                    # light mode exists to avoid
                    results[name][b] = f"rows-match={sp_count}"
                    totals[b][1] += 1
                    continue
                sp = df.toPandas()
            problems = compare(sp, du)
            if problems:
                results[name][b] = "FAIL " + problems[0][:60]
            else:
                results[name][b] = "ok"
                totals[b][0] += 1
        con.close()

    short = {b: b.rstrip("/").rsplit("/", 1)[-1] for b in brackets}
    width = max(len(n) for n in names) + 2
    cell_w = 22 if args.light else 12
    header = "query".ljust(width) + "".join(
        short[b].ljust(cell_w) for b in brackets
    )
    print(header)
    print("-" * len(header))
    any_fail = False
    for name in names:
        row = name.ljust(width)
        for b in brackets:
            cell = results[name].get(b, "-")
            if (
                cell not in ("ok", "skip(budget)", "skip(slow)", "-")
                and not cell.startswith("rows=")
                and not cell.startswith("rows-only=")
                and not cell.startswith("rows-match=")
            ):
                any_fail = True
            row += cell.ljust(cell_w)
        print(row)
    print("-" * len(header))
    line = "TOTAL hash/rows-only".ljust(width)
    for b in brackets:
        h, r, n = totals[b]
        line += f"{h}+{r}/{n}".ljust(cell_w)
    print(line)
    print(f"\nwall: {time.time() - t_start:.0f}s")
    sys.exit(1 if any_fail else 0)


if __name__ == "__main__":
    main()
