"""Adversarial chess-medallion probe: c01-c06 oracle parity on HOSTILE
month payloads (round-5; the NULL/unicode/non-finite probes cover the
x-family — this extends the same discipline to the medallion path).

Hostile variants injected over the standard demo month, all shapes a
real public-API crawl produces:

- **stripped PGN tags**: every 5th game loses its ECO + ECOUrl lines
  (casual games carry no opening classification), every 9th loses
  StartTime — the silver regex extracts must agree between engines on
  absent tags (empty-string vs NULL is exactly the kind of divergence
  this hunts).
- **RTL / emoji / combining-mark usernames**: Arabic, CJK, chess-piece
  emoji, NFD-decomposed Latin in the opponent fields AND the White/
  Black PGN tags (the "me" username keeps its odd-casing variants so
  the per-user filters still bind).
- **malformed time_control**: "", "abc", "1/86400" (daily
  correspondence), "600+" (truncated increment), "   " — the display
  expression and time-class bucketing must degrade identically.
- **degenerate move lists**: one game with ZERO moves (abandoned before
  the first move) and one with a single half-move.
- **partial accuracies**: white-only accuracy structs alongside the
  existing present/absent variance.

Both engines read the SAME staged files, so every divergence is a real
Spark↔DuckDB semantics gap, not fixture noise.  Output is committed per
round as SWEEP_r{N}_chess.txt.

Usage:
    python tools/chess_probe.py     # one status line per c-query
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

HOSTILE_NAMES = [
    "مها_الشطرنج",          # Arabic (RTL)
    "チェス選手42",            # CJK
    "knight♞rider🏆",        # emoji, incl. a chess piece
    "Zoë́_NFD",   # combining marks (NFD-style)
    "O'Brien-Smith",         # quoting hazard
]
BAD_TIME_CONTROLS = ["", "abc", "1/86400", "600+", "   "]


def hostile_payload(month: int, n: int = 45):
    """The standard demo month with hostile mutations layered on."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources import demo

    games = [demo.make_game(i, month) for i in range(n)]
    for i, g in enumerate(games):
        if i % 5 == 0:
            # strip opening classification tags entirely
            g["pgn"] = re.sub(r'\[ECO(Url)? "[^"]*"\]\n', "", g["pgn"])
        if i % 9 == 0:
            g["pgn"] = re.sub(r'\[StartTime "[^"]*"\]\n', "", g["pgn"])
        if i % 6 == 0:
            g["time_control"] = BAD_TIME_CONTROLS[(i // 6) % len(BAD_TIME_CONTROLS)]
        if i % 4 == 0:
            # hostile opponent name, mirrored into the PGN tags
            newname = HOSTILE_NAMES[(i // 4) % len(HOSTILE_NAMES)]
            opp_key = "black" if g["white"]["username"].lower().startswith("rhythm") else "white"
            old = g[opp_key]["username"]
            g[opp_key]["username"] = newname
            g[opp_key]["@id"] = f"https://api.chess.com/pub/player/{newname}"
            g["pgn"] = g["pgn"].replace(f'"{old}"', f'"{newname}"')
        if i % 11 == 0 and "accuracies" in g:
            g["accuracies"] = {"white": g["accuracies"]["white"]}  # partial
    # degenerate move lists: empty game and single half-move game
    for idx, movetext in ((7, ""), (13, "1. e4 {[%clk 0:09:59]}")):
        g = games[idx]
        head, _, _tail = g["pgn"].rpartition("\n\n")
        result = "1-0" if idx % 2 == 0 else "0-1"
        g["pgn"] = f"{head}\n\n{(movetext + ' ' + result).strip()}\n"
    return games


def main() -> int:
    import duckdb

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import (
        pipelines,
        suites,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.session import (
        get_spark,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources import demo
    from oracle_compare import compare

    # hostile payloads replace the standard month at the generator, so
    # BOTH the Spark staging and the DuckDB oracle read hostile bytes
    demo.month_payload = hostile_payload
    if os.path.isdir(pipelines.STAGE_DIR):
        shutil.rmtree(pipelines.STAGE_DIR)
    pipelines._staged.clear()

    spark = get_spark(app_name="chess-probe")
    con = duckdb.connect()
    wanted = [n for n in suites.FULL_QUERIES if n.startswith("c0")]
    failures = 0
    for name in wanted:
        t0 = time.time()
        try:
            df = suites.FULL_QUERIES[name](spark, "/root/testdata/sf0.001")
            rel = con.sql(suites.FULL_ORACLE[name])
            compare(df, rel)
            print(f"PASS      {name} rows={df.count()}  ({time.time()-t0:.1f}s)",
                  flush=True)
        except Exception:
            failures += 1
            print(f"FAIL      {name}  ({time.time()-t0:.1f}s)", flush=True)
            traceback.print_exc()
    # leave a clean stage for subsequent normal runs
    if os.path.isdir(pipelines.STAGE_DIR):
        shutil.rmtree(pipelines.STAGE_DIR)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
