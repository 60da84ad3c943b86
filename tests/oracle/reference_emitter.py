"""Independent pure-pandas reference emitter (FIXTURES.md §4).

Implements the same *rules* as the Spark pipeline — ontology cleanup +
nearest-ancestor propagation, word-bounded mention detection, leaf-only
linking with V/E disambiguation and preference ranking, exact-Jaccard
connected-component canonicalization, triple emission — but written
independently (plain dict/loop code, no Spark, no shared helpers except
the extraction function whose byte-identity is itself under test).

This is the golden side of the P/R >= 0.95 gate, re-expressing the
reference repo's i2pReport row-diff discipline as triple-set comparison
(Oracle/PCORNetLoader_ora.sql:2451-2565; BASELINE.json).
"""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd

WORD_RE = re.compile(r"\w")
NUM_RE = re.compile(r"metric:(\w+)(<=|>=|<|>|=|!=)(\d+(?:\.\d+)?)")
VE_CODE = re.compile(r"^[VE]")
VE_PATH = re.compile(r"\\(V|E)CODES?\\")


# --- ontology ---------------------------------------------------------------

def prepare_dict(dic: pd.DataFrame) -> pd.DataFrame:
    d = dic.copy()
    d["alias"] = d["alias"].str.strip().str.lower()
    d = d[d["alias"].notna() & (d["alias"].str.len() > 0)]
    # nearest-ancestor propagation for rows missing canonical_id
    by_path = {r.concept_path: r for r in d.itertuples()}
    resolved = {}
    for r in d.itertuples():
        cid = r.canonical_id
        cur = r
        steps = 0
        while (cid is None or (isinstance(cid, float))) and steps < 30:
            parent = by_path.get(cur.parent_path)
            if parent is None:
                break
            cid = parent.canonical_id
            cur = parent
            steps += 1
        resolved[r.concept_path] = cid
    d["canonical_id"] = d["concept_path"].map(resolved)
    return d


def linker_rows(dic: pd.DataFrame) -> pd.DataFrame:
    d = dic[dic["is_leaf"] & dic["canonical_id"].notna()].copy()
    # V/E disambiguation: drop misfiled codes
    keep = []
    for r in d.itertuples():
        if VE_CODE.match(str(r.canonical_id)) and not VE_PATH.search(r.concept_path):
            keep.append(False)
        else:
            keep.append(True)
    d = d[pd.Series(keep, index=d.index)]
    # preference rank per alias: leaf first (all leaves here), deeper first,
    # then path asc
    d = d.sort_values(["alias", "hlevel", "concept_path"], ascending=[True, False, True])
    return d.drop_duplicates("alias", keep="first")


# --- mentions ---------------------------------------------------------------

def find_mentions(text: str, aliases: set[str]) -> list[dict]:
    """Word-bounded alias occurrences + numeric observations. Written as
    a scan over character positions, not the engine's alternation regex."""
    out = []
    if not text:
        return out
    low = text.lower()
    for alias in aliases:
        start = 0
        while True:
            i = low.find(alias, start)
            if i < 0:
                break
            j = i + len(alias)
            before_ok = i == 0 or not WORD_RE.match(low[i - 1])
            after_ok = j >= len(low) or not WORD_RE.match(low[j])
            if before_ok and after_ok:
                out.append(
                    dict(span_start=i, span_end=j, surface=alias, kind="entity",
                         value_num=None, value_text=None)
                )
            start = i + 1
    for m in NUM_RE.finditer(text):
        val = float(m.group(3))
        cmp_map = {"=": "E", "!=": "NE", "<": "L", "<=": "LE", ">": "G", ">=": "GE"}
        out.append(
            dict(span_start=m.start(), span_end=m.end(), surface=m.group(1).lower(),
                 kind="numeric",
                 value_num=val if val <= 10_000_000.0 else None,
                 value_text=cmp_map[m.group(2)])
        )
    return out


# --- canonicalization -------------------------------------------------------

def shingles(text: str, k: int = 3) -> set[str]:
    w = text.split()
    if len(w) <= k:
        return {" ".join(w)} if w else set()
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def canon_mapping(pages: pd.DataFrame, threshold: float = 0.8) -> dict[str, str]:
    sh = {r.url: shingles(r.text) for r in pages.itertuples()}
    urls = sorted(sh)
    # blocking by shingle (same as the engine's equi-join, done with dicts)
    by_shingle = defaultdict(list)
    for u in urls:
        for s in sh[u]:
            by_shingle[s].append(u)
    pairs = set()
    for us in by_shingle.values():
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                pairs.add((min(us[i], us[j]), max(us[i], us[j])))
    parent = {u: u for u in urls}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if union and inter / union >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {u: find(u) for u in urls}


# --- emission ---------------------------------------------------------------

def emit_triples(
    pages: pd.DataFrame, dic: pd.DataFrame, langs: tuple[str, ...] = ("en",)
) -> set[tuple]:
    """Full reference pipeline -> set of (subj, pred, obj, src_url)."""
    p = pages[pages["lang"].isin(langs)].copy() if langs else pages.copy()
    d = linker_rows(prepare_dict(dic))
    alias_to = {r.alias: (r.canonical_id, r.pred) for r in d.itertuples()}
    mapping = canon_mapping(p)
    triples: set[tuple] = set()
    spans: dict[str, list] = {}
    for r in p.itertuples():
        subj = mapping.get(r.url, r.url)
        triples.add((subj, "hasLang", r.lang, r.url))
        e = spans.get(subj)
        if e is None:
            spans[subj] = [r.warc_ts, r.warc_ts, r.url]
        else:
            e[0] = min(e[0], r.warc_ts)
            e[1] = max(e[1], r.warc_ts)
            e[2] = min(e[2], r.url)
        if subj != r.url:
            triples.add((r.url, "sameAs", subj, r.url))
        for m in find_mentions(r.text, set(alias_to)):
            if m["kind"] == "numeric":
                # measurement assertions: metric name is the concept
                # (pmnVITAL/pmnLAB analog); value/comparator live in the
                # qualifier columns, outside the 4-tuple identity
                triples.add(
                    (subj, "hasMeasurement", "METRIC:" + m["surface"].upper(), r.url)
                )
                continue
            cid, pred = alias_to[m["surface"]]
            triples.add((subj, pred, cid, r.url))
    # observed per-subject span (enrollment analog; the pipeline's
    # curated-periods override is pytest-covered separately)
    fmt = "%Y-%m-%dT%H:%M:%SZ"
    for subj, (mn, mx, src) in spans.items():
        triples.add(
            (subj, "hasSpan", mn.strftime(fmt) + "/" + mx.strftime(fmt), src)
        )
    return triples


def precision_recall(got: set[tuple], want: set[tuple]) -> tuple[float, float]:
    if not got or not want:
        return (0.0, 0.0)
    tp = len(got & want)
    return tp / len(got), tp / len(want)
