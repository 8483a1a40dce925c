"""Deterministic synthetic Chess.com demo/fixture data (FIXTURES.md §A).

Freshly generated — mirrors the *schema and value shapes* of the
reference's observed API payload (dev_files/Data/2024-01/games.json),
covering: all 15 result codes, odd/even move counts, optional accuracies,
username case variance, multiple months, and prefix-nested openings.
"""

from __future__ import annotations

import json

USERNAME = "Rhythmbear1"

RESULT_CODES = [
    "win",
    "checkmated",
    "agreed",
    "repetition",
    "timeout",
    "resigned",
    "stalemate",
    "lose",
    "insufficient",
    "50move",
    "abandoned",
    "kingofthehill",
    "threecheck",
    "timevsinsufficient",
    "bughousepartnerlose",
]

ECO_URLS = [
    ("C00", "https://www.chess.com/openings/French-Defense"),
    ("C02", "https://www.chess.com/openings/French-Defense-Advance-Variation"),
    ("B20", "https://www.chess.com/openings/Sicilian-Defense"),
    ("B21", "https://www.chess.com/openings/Sicilian-Defense-Smith-Morra-Gambit"),
    ("D00", "https://www.chess.com/openings/Queens-Pawn-Opening"),
    ("A00", "https://www.chess.com/openings/Amar-Opening-Paris-Gambit"),
]

TIME_CONTROLS = ["60", "120+1", "300", "600", "600+5", "180"]
SAN_POOL = ["e4", "e6", "d4", "d5", "Nf3", "Nc6", "Bb5", "a6", "Ba4", "Nf6", "O-O", "Be7"]

# openings lookup with nested prefixes (longest-prefix classifier needs
# pgn values that are prefixes of one another)
OPENINGS_LOOKUP = [
    ("C", "C00", "French Defense", "1. e4 e6"),
    ("C", "C02", "French Defense: Advance Variation", "1. e4 e6 2. d4 d5 3. e5"),
    ("B", "B20", "Sicilian Defense", "1. e4 c5"),
    ("B", "B21", "Sicilian Defense: Smith-Morra Gambit", "1. e4 c5 2. d4"),
    ("D", "D00", "Queen's Pawn Opening", "1. d4 d5"),
    ("A", "A00", "Amar Opening: Paris Gambit", "1. Nh3 d5 2. g3 e5 3. f4"),
]


def moves_for(i: int) -> list[str]:
    n = 3 + (i % 10)  # 3..12 half-moves, odd and even
    return [SAN_POOL[j % len(SAN_POOL)] for j in range(n)]


def numbered_pgn_moves(moves: list[str]) -> str:
    """Chess.com live-PGN move text with clock comments."""
    out = []
    for j, mv in enumerate(moves):
        no = j // 2 + 1
        prefix = f"{no}. " if j % 2 == 0 else f"{no}... "
        out.append(f"{prefix}{mv} {{[%clk 0:09:{59 - j:02d}]}}")
    return " ".join(out)


def make_game(i: int, month: int = 1, last_updated_day: int = 1) -> dict:
    my_is_white = i % 2 == 0
    # username casing variance: the raw payload carries display casing;
    # every 5th game uses odd casing to exercise case-insensitive compare
    me = USERNAME if i % 5 else "rHYTHMBEAR1"
    opp = f"Opponent{i:03d}"
    white_user, black_user = (me, opp) if my_is_white else (opp, me)
    my_result = RESULT_CODES[i % len(RESULT_CODES)]
    opp_result = {"win": "resigned", "lose": "win"}.get(my_result, "win")
    white_result, black_result = (
        (my_result, opp_result) if my_is_white else (opp_result, my_result)
    )
    eco, eco_url = ECO_URLS[i % len(ECO_URLS)]
    tc = TIME_CONTROLS[i % len(TIME_CONTROLS)]
    day = i % 27 + 1
    date = f"2024.{month:02d}.{day:02d}"
    start = f"{10 + i % 12}:{i % 60:02d}:{(7 * i) % 60:02d}"
    end = f"{10 + i % 12}:{(i % 60 + 9) % 60:02d}:{(11 * i) % 60:02d}"
    moves = moves_for(i)
    pgn = (
        f'[Event "Live Chess"]\n'
        f'[Site "Chess.com"]\n'
        f'[Date "{date}"]\n'
        f'[White "{white_user}"]\n'
        f'[Black "{black_user}"]\n'
        f'[Result "{"1-0" if my_is_white else "0-1"}"]\n'
        f'[CurrentPosition "rnbqkbnr/pppppppp/8/8 w KQkq - {i}"]\n'
        f'[Timezone "UTC"]\n'
        f'[ECO "{eco}"]\n'
        f'[ECOUrl "{eco_url}"]\n'
        f'[StartTime "{start}"]\n'
        f'[EndDate "{date}"]\n'
        f'[EndTime "{end}"]\n'
        f"\n{numbered_pgn_moves(moves)} {'1-0' if my_is_white else '0-1'}\n"
    )
    game = {
        "url": f"https://www.chess.com/game/live/{1000 + month * 100 + i}",
        "pgn": pgn,
        "time_control": tc,
        "end_time": 1704100000 + i * 600,
        "rated": i % 3 != 0,
        "tcn": "mCZRlB!T",
        "uuid": f"uuid-{month}-{i}",
        "initial_setup": "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq -",
        "fen": f"rnbqkbnr/pppppppp/8/8 w KQkq - {i}",
        "time_class": ["bullet", "blitz", "rapid"][i % 3],
        "rules": "chess",
        "white": {
            "rating": 1400 + i,
            "result": white_result,
            "@id": f"https://api.chess.com/pub/player/{white_user.lower()}",
            "username": white_user,
            "uuid": f"pu-{white_user}",
        },
        "black": {
            "rating": 1390 + i,
            "result": black_result,
            "@id": f"https://api.chess.com/pub/player/{black_user.lower()}",
            "username": black_user,
            "uuid": f"pu-{black_user}",
        },
    }
    if i % 7 == 0:  # optional struct, present on a minority of rows
        game["accuracies"] = {"white": 80.0 + i % 15, "black": 70.0 + i % 20}
    return game


def month_payload(month: int, n: int = 45) -> list[dict]:
    return [make_game(i, month) for i in range(n)]


def write_month_json(path: str, month: int, n: int = 45) -> str:
    games = month_payload(month, n)
    with open(path, "w") as f:
        json.dump(games, f)
    return path
