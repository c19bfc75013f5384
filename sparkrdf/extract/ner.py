"""Batched mention detection (dictionary NER).

One compiled alternation regex over the full gazetteer (longest surface
first, word-boundary anchored), applied per Arrow batch in ``mapInPandas``.
Output: one row per (url, surface, count, first_off). No per-row Python UDFs
— the regex runs vectorized over each batch; the gazetteer is baked into the
closure (equivalently a broadcast: it ships once per executor).
"""

from __future__ import annotations

import re

from sparkrdf.extract.gazetteer import surfaces

MENTIONS_SCHEMA = "url string, surface string, n int, first_off int"


def _pattern() -> re.Pattern:
    alts = sorted(set(surfaces()), key=len, reverse=True)
    return re.compile(r"(?<!\w)(" + "|".join(re.escape(s) for s in alts) + r")(?!\w)")


def detect_mentions(pages):
    """pages(url, text, ...) → mentions(url, surface, n, first_off)."""
    import pandas as pd

    def run(batches):
        pat = _pattern()
        for pdf in batches:
            out = []
            for url, text in zip(pdf["url"], pdf["text"]):
                if not text:
                    continue
                found: dict[str, list[int]] = {}
                for m in pat.finditer(text):
                    found.setdefault(m.group(1), []).append(m.start())
                for surface, offs in found.items():
                    out.append((url, surface, len(offs), offs[0]))
            yield pd.DataFrame(out, columns=["url", "surface", "n", "first_off"])

    return pages.select("url", "text").mapInPandas(run, MENTIONS_SCHEMA)
