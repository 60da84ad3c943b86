"""Stage 2a — batched mention detection over extracted text.

The analog of scanning observation_fact: each mention is an EAV-style
observation (url=entity, surface=attribute code, value_num/value_text=
value, kind=valtype discriminator N/T,
Oracle/PCORNetLoader_ora.sql:1956-1958).

Implementation: one Series->Series pandas UDF per page batch that runs a
single compiled alternation regex (Aho-Corasick-lite) built from the
broadcast dictionary alias list, plus a numeric-observation regex with
comparator prefixes (the tval_char E/NE/L/LE/G/GE analog,
Oracle/PCORNetLoader_ora.sql:1915). The UDF returns an array of mention
structs per page; the caller explodes. No per-row Python appears in the
plan — the loop over regex matches is inside one Arrow batch.

Determinism: mention_id = xxhash64(url, span_start) — NOT
monotonically_increasing_id, which depends on partition layout and would
break resume/parity across parallelism levels (SURVEY.md §1.4).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

MENTION_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("span_start", T.IntegerType()),
            T.StructField("span_end", T.IntegerType()),
            T.StructField("surface", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("value_num", T.DoubleType()),
            T.StructField("value_text", T.StringType()),
        ]
    )
)

# numeric observation: "metric:<name><cmp><number>", comparator optional
_NUMERIC = re.compile(r"metric:(\w+)(<=|>=|<|>|=|!=)(\d+(?:\.\d+)?)")
_CMP_MAP = {"=": "E", "!=": "NE", "<": "L", "<=": "LE", ">": "G", ">=": "GE"}

# Value-domain guard — nval_num outlier suppression
# (Oracle/PCORNetLoader_ora.sql:1687,1914).
MAX_VALUE_NUM = 10_000_000.0


def _compile_alias_regex(aliases: list[str]) -> re.Pattern:
    # longest-first so overlapping aliases prefer the most specific match,
    # word-bounded so 'agg' does not match inside 'aggregate'
    parts = sorted((re.escape(a) for a in aliases if a), key=len, reverse=True)
    return re.compile(r"\b(" + "|".join(parts) + r")\b", re.IGNORECASE)


def make_mention_udf(aliases: list[str]):
    """Build the detection UDF with the alias set baked in. The caller
    passes aliases collected from the (small) dictionary; Spark ships the
    compiled pattern once per executor, not per row."""
    pattern = _compile_alias_regex(aliases) if aliases else None

    @pandas_udf(MENTION_STRUCT)
    def detect(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if t is None:
                out.append([])
                continue
            ms = []
            if pattern is not None:
                for m in pattern.finditer(t):
                    ms.append(
                        (m.start(), m.end(), m.group(1).lower(), "entity", None, None)
                    )
            for m in _NUMERIC.finditer(t):
                val = float(m.group(3))
                ms.append(
                    (
                        m.start(),
                        m.end(),
                        m.group(1).lower(),
                        "numeric",
                        val if val <= MAX_VALUE_NUM else None,
                        _CMP_MAP.get(m.group(2), "OT"),
                    )
                )
            out.append(ms)
        return pd.Series(out)

    return detect


def detect_mentions(pages: DataFrame, aliases: list[str]) -> DataFrame:
    """pages(url, warc_ts, text, ...) -> mentions, one row per mention.

    Output: (url, warc_ts, mention_id, span_start, span_end, surface,
    kind, value_num, value_text).
    """
    udf = make_mention_udf(aliases)
    withm = pages.select(
        "url", "warc_ts", F.explode(udf(F.col("text"))).alias("m")
    )
    return withm.select(
        "url",
        "warc_ts",
        F.xxhash64(F.col("url"), F.col("m.span_start")).alias("mention_id"),
        F.col("m.span_start").alias("span_start"),
        F.col("m.span_end").alias("span_end"),
        F.col("m.surface").alias("surface"),
        F.col("m.kind").alias("kind"),
        F.col("m.value_num").alias("value_num"),
        F.col("m.value_text").alias("value_text"),
    )
