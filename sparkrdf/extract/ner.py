"""Batched mention detection (dictionary NER).

One compiled alternation regex over the full dictionary (longest surface
first, word-boundary anchored), applied per Arrow batch in ``mapInPandas``.
Output: one row per (id, surface, count, first_off). No per-row Python UDFs
— the regex runs vectorized over each batch; the dictionary is baked into the
closure (equivalently a broadcast: it ships once per executor).

The dictionary is pluggable (``dictionary=`` + ``id_col``/``text_col``) so
the same operator serves both the gazetteer pipeline over pages and
arbitrary phrase dictionaries over the ``documents`` table; the default is
the extraction gazetteer. Longest-first alternation gives leftmost-longest
overlap resolution ("Alan Turing" beats "Turing") — identical semantics to
RE2's leftmost-first scan with the same alternation order, which is what
makes the operator oracle-checkable with DuckDB ``regexp_extract_all``.
"""

from __future__ import annotations

import re
from typing import Sequence

from sparkrdf.extract.gazetteer import surfaces


def mention_pattern(dictionary: Sequence[str] | None = None) -> str:
    """The alternation source string, deterministically ordered by
    (-len, lexicographic) so Python re and RE2 (DuckDB) compile the same
    preference order. Equal-length distinct literals can never compete at
    one position, so the lexicographic tie-break is purely for determinism
    of the pattern text itself."""
    alts = sorted(set(dictionary if dictionary is not None else surfaces()),
                  key=lambda s: (-len(s), s))
    return r"(?<!\w)(" + "|".join(re.escape(s) for s in alts) + r")(?!\w)"


def detect_mentions(df, dictionary: Sequence[str] | None = None,
                    id_col: str = "url", text_col: str = "text"):
    """df(id_col, text_col, ...) → mentions(id_col, surface, n, first_off)."""
    import pandas as pd

    src = mention_pattern(dictionary)
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, surface string, n int, first_off int"

    def run(batches):
        pat = re.compile(src)
        for pdf in batches:
            out = []
            for key, text in zip(pdf[id_col], pdf[text_col]):
                if not text:
                    continue
                found: dict[str, list[int]] = {}
                for m in pat.finditer(text):
                    found.setdefault(m.group(1), []).append(m.start())
                for surface, offs in found.items():
                    out.append((key, surface, len(offs), offs[0]))
            yield pd.DataFrame(out, columns=[id_col, "surface", "n", "first_off"])

    return df.select(id_col, text_col).mapInPandas(run, schema)
