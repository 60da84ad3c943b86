"""Deterministic synthetic fixture generator (FIXTURES.md shapes).

Generates, from a fixed seed, the `pages` table (exactly the
BASELINE.json input_hint schema), the `concept_dict` ontology table with
the deliberate dirty cases the cleanup logic must handle, and records
the ground-truth text per url so extraction byte-identity is checkable.

Pure pandas/pyarrow — no Spark needed to generate, so tests and bench
can materialize fixtures cheaply at any scale. Zipf-hot domains and hub
entity surfaces are built in for the skew tests (FIXTURES.md §1).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu data table join hash"
).split()

# dictionary domains — the demo/diag/proc/lab/med/enc analog
DOMAINS = ["PERSON", "TOPIC", "PLACE", "METRIC", "ORG", "EVENT"]

HTML_TMPL = (
    "<html><head><title>{title}</title></head><body>"
    "<nav>home about {domain}</nav>"
    "<p>{text}</p>"
    "<footer>&copy; 2023 {domain} contact terms</footer></body></html>"
)


def make_concept_dict(n_concepts: int = 200, seed: int = 42) -> pd.DataFrame:
    """Concept dictionary with hierarchy + dirty cases (FIXTURES.md §2):
    duplicate aliases under different parents, folders with wrongly
    non-null canonical ids, leaves missing canonical ids that must
    inherit from ancestors, V/E-style misfiled codes."""
    rng = np.random.RandomState(seed)
    rows = []
    for d_i, dom in enumerate(DOMAINS):
        root = f"\\KG\\{dom}"
        rows.append(
            dict(concept_path=root, alias=f"_{dom.lower()}_root", canonical_id=f"{dom}:ROOT",
                 pred=f"has{dom.title()}", dim_codes=[], is_leaf=False, hlevel=2,
                 parent_path="\\KG")
        )
        per_dom = n_concepts // len(DOMAINS)
        for j in range(per_dom):
            alias = VOCAB[(d_i * per_dom + j) % len(VOCAB)] + (
                "" if j < len(VOCAB) else str(j)
            )
            folder = f"{root}\\F{j % 5}"
            if j % 5 == 0:
                # folder row; every 10th folder wrongly carries a canonical id
                rows.append(
                    dict(concept_path=folder, alias=f"_f{dom.lower()}{j}",
                         canonical_id=(f"{dom}:BAD{j}" if j % 10 == 0 else None),
                         pred=f"has{dom.title()}", dim_codes=[], is_leaf=False,
                         hlevel=3, parent_path=root)
                )
            leaf_path = f"{folder}\\{alias.upper()}{j}"
            # ~15% of leaves miss canonical_id -> must inherit from ancestor
            cid = None if j % 7 == 3 else f"{dom}:{alias.upper()}{j}"
            rows.append(
                dict(concept_path=leaf_path, alias=alias, canonical_id=cid,
                     pred=f"has{dom.title()}",
                     dim_codes=[alias, alias.upper()], is_leaf=True,
                     hlevel=4, parent_path=folder)
            )
            # duplicate-alias dirty case: same alias filed under a second parent
            if j % 11 == 5:
                rows.append(
                    dict(concept_path=f"{root}\\F{(j + 1) % 5}\\{alias.upper()}{j}X",
                         alias=alias, canonical_id=f"{dom}:DUP{j}",
                         pred=f"has{dom.title()}", dim_codes=[alias],
                         is_leaf=True, hlevel=3, parent_path=f"{root}\\F{(j + 1) % 5}")
                )
    return pd.DataFrame(rows)


def make_pages(
    n_pages: int = 1000,
    seed: int = 42,
    n_domains: int = 50,
    dup_frac: float = 0.08,
    hub_alias: str = "alpha",
) -> pd.DataFrame:
    """pages + ground truth. Columns: url, warc_ts, html, text, lang,
    plus ground-truth helper columns (true_text, is_dup_of) the tests
    use and the engine must NOT read."""
    rng = np.random.RandomState(seed)
    # Zipf(1.2)-hot registrable domains (FIXTURES.md §1)
    zipf_w = 1.0 / np.arange(1, n_domains + 1) ** 1.2
    zipf_w /= zipf_w.sum()
    domains = [f"site{i}.example.com" for i in range(n_domains)]

    langs = rng.choice(["en", "es", "fr"], size=n_pages, p=[0.9, 0.05, 0.05])
    base_rows = []
    for i in range(n_pages):
        dom = domains[rng.choice(n_domains, p=zipf_w)]
        n_words = rng.randint(20, 120)
        words = [VOCAB[k] for k in rng.randint(0, len(VOCAB), size=n_words)]
        # hub entity surface on >10% of pages (FIXTURES.md invariant)
        if rng.rand() < 0.15:
            words.insert(rng.randint(0, len(words)), hub_alias)
        # numeric observation mentions, some outliers > 1e7 (must be suppressed)
        if rng.rand() < 0.3:
            val = 20000000.0 if rng.rand() < 0.1 else round(float(rng.rand() * 100), 1)
            cmp_op = rng.choice(["=", "<", ">", "<=", ">=", "!="])
            words.append(f"metric:temp{cmp_op}{val}")
        text = " ".join(words)
        base_rows.append((i, dom, text, langs[i]))

    rows = []
    n_dups = int(n_pages * dup_frac)
    for i, dom, text, lang in base_rows:
        url = f"https://{dom}/page/{i}"
        rows.append(_page_row(url, i, dom, text, lang, seed, is_dup_of=None))
    # near-duplicates: clone an early page with a tiny mutation
    for j in range(n_dups):
        src = base_rows[j * 3 % len(base_rows)]
        i, dom, text, lang = src
        mut = text + " mirror"
        url = f"https://{dom}/mirror/{i}-{j}"
        rows.append(
            _page_row(url, n_pages + j, dom, mut, lang, seed,
                      is_dup_of=f"https://{dom}/page/{i}")
        )
    df = pd.DataFrame(
        rows,
        columns=["url", "warc_ts", "html", "text", "lang", "true_text", "is_dup_of"],
    )
    # dirty html cases (FIXTURES.md): ~5% malformed tags, ~2% stray non-UTF8 bytes
    rng2 = np.random.RandomState(seed + 1)
    idx = rng2.choice(len(df), size=max(len(df) // 20, 1), replace=False)
    for k in idx:
        df.at[k, "html"] = df.at[k, "html"].replace(b"</p>", b"</p", 1)
    idx2 = rng2.choice(len(df), size=max(len(df) // 50, 1), replace=False)
    for k in idx2:
        df.at[k, "html"] = df.at[k, "html"] + b"\xff\xfe<!-- trailing junk -->"
    return df


def _page_row(url, i, dom, text, lang, seed, is_dup_of):
    import html as _h

    ts = pd.Timestamp("2023-01-01") + pd.Timedelta(seconds=int(i) * 997 % 31536000)
    # entity-escape the body like a real page; extraction unescapes back
    html = HTML_TMPL.format(
        title=f"page {i}", domain=dom, text=_h.escape(text, quote=False)
    ).encode("utf-8")
    return (url, ts, html, text, lang, text, is_dup_of)


def write_fixture(out_dir: str, n_pages: int = 1000, seed: int = 42) -> dict:
    """Materialize pages.parquet + concept_dict.parquet under out_dir.
    Returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    pages = make_pages(n_pages=n_pages, seed=seed)
    dic = make_concept_dict(seed=seed)
    pages_path = os.path.join(out_dir, "pages.parquet")
    dict_path = os.path.join(out_dir, "concept_dict.parquet")
    # Spark cannot read TIMESTAMP(NANOS) parquet — force microseconds
    pages["warc_ts"] = pages["warc_ts"].astype("datetime64[us]")
    # small row groups keep the file splittable so Spark parallelizes the
    # scan even when the fixture is a single file
    pages.drop(columns=["true_text", "is_dup_of"]).to_parquet(
        pages_path, index=False, row_group_size=2048
    )
    pages[["url", "true_text", "is_dup_of"]].to_parquet(
        os.path.join(out_dir, "golden_pages.parquet"), index=False
    )
    dic.to_parquet(dict_path, index=False)
    return {"pages": pages_path, "concept_dict": dict_path, "dir": out_dir}
