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
    return re.compile(r"\b(" + r"|".join(parts) + r")\b", re.IGNORECASE)


# Past this many aliases the compiled alternation's per-position cost
# (O(|aliases|)-ish in CPython re) dominates; the token engine's cost is
# O(tokens) regardless of dictionary size.
TOKEN_ENGINE_MIN_ALIASES = 4096

_TOKEN_RE = re.compile(r"\w+")


def _build_token_index(aliases: list[str]):
    """first-token -> [(alias_lower, n_tokens, char_len)] sorted by char
    length DESC — the same longest-first preference as the alternation
    regex. Returns None when any alias is not a plain word sequence (the
    regex path then keeps exact semantics for exotic aliases)."""
    by_first: dict[str, list[tuple[str, int, int]]] = {}
    for a in aliases:
        if not a:
            continue
        low = a.lower()
        toks = low.split(" ")
        if any(not t or _TOKEN_RE.fullmatch(t) is None for t in toks):
            return None
        by_first.setdefault(toks[0], []).append((low, len(toks), len(low)))
    for v in by_first.values():
        v.sort(key=lambda x: -x[2])
    return by_first


def _token_find(t: str, by_first) -> list[tuple[int, int, str]]:
    """Longest-first, non-overlapping, word-bounded alias matches via
    tokenization — byte-identical to the alternation regex's semantics
    (matches start at word boundaries = token starts; after a match the
    scan resumes at its end; ties impossible because equal-length
    matches at one position are the same lowered string)."""
    spans = [(m.start(), m.end()) for m in _TOKEN_RE.finditer(t)]
    out = []
    i = 0
    n = len(spans)
    while i < n:
        s0, e0 = spans[i]
        cands = by_first.get(t[s0:e0].lower())
        hit = None
        if cands:
            for alias, ntok, alen in cands:  # char-length desc
                j = i + ntok - 1
                if j < n:
                    end = spans[j][1]
                    if end - s0 == alen and t[s0:end].lower() == alias:
                        hit = (s0, end, alias, j)
                        break
        if hit:
            out.append((hit[0], hit[1], hit[2]))
            i = hit[3] + 1
        else:
            i += 1
    return out


def make_mention_udf(aliases: list[str], engine: str = "auto"):
    """Build the detection UDF with the alias set baked in. The caller
    passes aliases collected from the (small) dictionary; Spark ships the
    compiled pattern / token index once per executor, not per row.

    engine: 'regex' (compiled alternation — fastest under ~10^3
    aliases), 'token' (tokenize-then-hash-lookup — O(tokens) per page
    independent of dictionary size, the realistic-ontology path at
    10^5-10^6 aliases, pcornet_med scale), or 'auto' (token engine past
    TOKEN_ENGINE_MIN_ALIASES when every alias is a plain word sequence).
    Both engines produce byte-identical output (pytest-asserted)."""
    token_index = None
    pattern = None
    if aliases:
        if engine in ("auto", "token"):
            token_index = _build_token_index(aliases)
            if token_index is None and engine == "token":
                raise ValueError("token engine requires plain word-sequence aliases")
        use_token = token_index is not None and (
            engine == "token"
            or (engine == "auto" and len(aliases) >= TOKEN_ENGINE_MIN_ALIASES)
        )
        if not use_token:
            token_index = None
            pattern = _compile_alias_regex(aliases)

    @pandas_udf(MENTION_STRUCT)
    def detect(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if t is None:
                out.append([])
                continue
            ms = []
            if token_index is not None:
                for s, e, alias in _token_find(t, token_index):
                    ms.append((s, e, alias, "entity", None, None))
            elif pattern is not None:
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


def detect_mentions(pages: DataFrame, aliases: list[str], engine: str = "auto") -> DataFrame:
    """pages(url, warc_ts, text, ...) -> mentions, one row per mention.

    Output: (url, warc_ts, mention_id, span_start, span_end, surface,
    kind, value_num, value_text).
    """
    udf = make_mention_udf(aliases, engine)
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
