"""Unicode-injected differential sweep: oracle parity on non-ASCII text.

Derives a copy of the sf0.001 fixtures with every 9th document text
replaced by adversarial Unicode (diacritics, CJK, RTL Arabic, emoji,
combining marks, exotic whitespace, Greek incl. capital/final sigma,
Turkish dotted/dotless i, astral-plane letters, ligatures/titlecase
digraphs) and runs the x-family queries against their DuckDB oracles
over the SAME files.

What it found (round 4): Spark/Java ``lower`` applies Unicode
SpecialCasing (İ → i + combining dot) and the contextual final-sigma
rule (word-final Σ → ς), while DuckDB (utf8proc) applies simple 1:1
mappings — so every case-normalized hash key (exact-dedup fingerprint,
SimHash, x39's token casing) silently diverged on such text.  Fixed by
``functions.text.casefold`` / ``CASEFOLD_SQL``: pre-substituting the
only two divergent inputs before lower() on BOTH engines.

Usage:
    python tools/unicode_probe.py         # prints one status line/query
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.001"
DST = "/tmp/sf_unicode"

INJECT = [
    "héllo wörld straße ÜBER naïve café",
    "日本語 テキスト 中文 文本 한국어 텍스트",
    "مرحبا بالعالم شكرا جزيلا",
    "emoji 😀 test 🎉🎊 mixed 🚀 content",
    "combining é à ô marks",
    "tab\tsep nbsp emsp ls mixed",
    "ΑΒΓΔ αβγδ ΣΙΓΜΑ σίγμα ς ΟΔΟΣ",
    "İstanbul ıssız TİTLE dotless",
    "𝕞𝕒𝕥𝕙 𝒻𝒶𝓃𝒸𝓎 𝔤𝔬𝔱𝔥𝔦𝔠 chars",
    "ﬁﬂ ligatures ǅǈ titlecase ǆǉ",
    # x63 fuzzy-key cases (r9 verdict #4): CJK-heavy and RTL-mixed
    # texts whose ASCII-squashed keys are short-but-above the min-key
    # gate, so the PassJoin banding and the thresholded levenshtein run
    # on genuinely mixed-script keys cross-engine (the gate itself is
    # pinned by tests/test_fuzzy.py; this is the oracle-parity check)
    "混合スクリプト mixkey7 编排 test",
    "مزيج rtl-مع mixkey9 نص قصير",
]


def build_fixture() -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(DST, f"{t}.parquet")
        )
    d = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pydict()
    n = len(d["doc_id"])
    for i in range(0, n, 9):
        d["text"][i] = INJECT[(i // 9) % len(INJECT)] + " suffix" + str(i)
    pq.write_table(pa.table(d), os.path.join(DST, "documents.parquet"))
    return DST


def main() -> int:
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites

    build_fixture()
    names = sorted(n for n in suites.FULL_QUERIES if n.startswith("x"))
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "local_sweep.py"), DST]
        + names
    )


if __name__ == "__main__":
    raise SystemExit(main())
