"""Mention-detection engine scaling vs dictionary size.

Times the two detection kernels (alternation regex vs token engine)
over the same synthetic corpus at growing alias counts — the evidence
that the token engine holds at realistic ontology scale (10^5-10^6
aliases, the reference's pcornet_med regime) where the regex
alternation's per-position cost grows with |aliases|.

Kernel-level timing (no Spark): both engines run inside the same Arrow
batch loop in production, so per-batch kernel cost is the whole story.

Usage: python BENCH/mentions_scale.py [--pages 2000] [--append]
"""

from __future__ import annotations

import argparse
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kgforge.mentions import _build_token_index, _compile_alias_regex, _token_find

WORDS = [f"w{i}" for i in range(40)]


def corpus(n_pages: int, seed: int = 11) -> list[str]:
    rng = random.Random(seed)
    return [
        " ".join(rng.choice(WORDS) for _ in range(rng.randint(40, 120)))
        for _ in range(n_pages)
    ]


def aliases_of(n: int) -> list[str]:
    # 30 aliases that actually occur (the corpus words) + n-30 that do
    # not (realistic: most of a big ontology never matches a given page)
    return WORDS[:30] + [f"alias{i}" for i in range(n - 30)]


def run(n_pages: int) -> list[dict]:
    pages = corpus(n_pages)
    out = []
    for n_alias in (100, 10_000, 50_000):
        al = aliases_of(n_alias)
        pat = _compile_alias_regex(al)
        t0 = time.time()
        c_re = sum(1 for t in pages for _ in pat.finditer(t))
        t_re = time.time() - t0
        idx = _build_token_index(al)
        t0 = time.time()
        c_tok = sum(len(_token_find(t, idx)) for t in pages)
        t_tok = time.time() - t0
        assert c_re == c_tok, (c_re, c_tok)
        out.append(
            dict(n_alias=n_alias, regex_s=round(t_re, 3), token_s=round(t_tok, 3),
                 matches=c_re)
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2000)
    ap.add_argument("--append", action="store_true",
                    help="append the measured table to BENCH/BASELINE.md")
    args = ap.parse_args()
    rows = run(args.pages)
    lines = [
        "",
        f"### Mention-detection engine vs dictionary size ({args.pages} pages, kernel time)",
        "",
        "| aliases | regex alternation | token engine |",
        "|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['n_alias']:,} | {r['regex_s']}s | {r['token_s']}s |")
    g = rows[-1]
    base = rows[0]
    lines.append("")
    lines.append(
        f"Regex degrades {g['regex_s'] / max(base['regex_s'], 1e-9):.1f}x from 100 to "
        f"50k aliases; the token engine {g['token_s'] / max(base['token_s'], 1e-9):.1f}x "
        "(dictionary-size-independent, as designed — `detect_mentions` auto-switches "
        "past 4,096 aliases; outputs byte-identical, pytest-pinned)."
    )
    text = "\n".join(lines)
    print(text)
    if args.append:
        with open(Path(__file__).parent / "BASELINE.md", "a") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
