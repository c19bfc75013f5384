"""Deterministic synthesis of the Common-Crawl-style pages table.

Schema per BASELINE.json input_hint / FIXTURES.md §1:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Rules (seed-free — every column is a pure function of the row index i, and
the html is a pure function of farmhash(url), so any scale/partitioning
produces identical rows):
- url      = https://site{i%997}.example.org/page/{i}
- warc_ts  = 2025-01-01T00:00:00Z + (i*7919) % 31_536_000 seconds
- html     = templated page rendered from an LCG seeded with farmhash(url);
  paragraphs embed gazetteer mentions; every 101st row is malformed markup
- text     = extract_text(html)  (the byte-identity invariant, by construction)
- lang     = en (85%), de/fr/da cycling otherwise
- skew     = rows with i % 100 == 0 share one domain (site0) and always
  mention the dominant entity (Ada_Lovelace) — makes one predicate/entity
  Zipf-heavy to exercise skew handling

Generation is distributed: ``spark.range(n)`` → ``mapInPandas`` (Arrow
batches), no driver-side materialization — at bench scale this synthesizes
millions of rows in parallel.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from sparkrdf.extract.gazetteer import ENTITIES
from sparkrdf.extract.html_text import extract_text
from sparkrdf.hashing import fingerprint64

_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)

_FILLER = (
    "analysis of large scale web data requires careful pipeline design "
    "the corpus contains documents crawled from public pages each record "
    "holds markup text and metadata extraction quality matters for every "
    "downstream knowledge task"
).split()

_LANGS = ["de", "fr", "da"]


class _LCG:
    """Minimal deterministic PRNG (MMIX constants), independent of Python's
    random module internals."""

    __slots__ = ("state",)

    def __init__(self, seed: int):
        self.state = seed & 0xFFFFFFFFFFFFFFFF or 1

    def next(self) -> int:
        self.state = (self.state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        return self.state >> 16

    def randint(self, lo: int, hi: int) -> int:  # inclusive
        return lo + self.next() % (hi - lo + 1)

    def choice(self, seq):
        return seq[self.next() % len(seq)]


def page_url(i: int) -> str:
    domain = 0 if i % 100 == 0 else i % 997  # 1% hot domain
    return f"https://site{domain}.example.org/page/{i}"


def page_lang(i: int) -> str:
    return "en" if (i * 2654435761) % 100 < 85 else _LANGS[i % 3]


def render_html(i: int) -> bytes:
    url = page_url(i)
    rng = _LCG(fingerprint64(url))
    title_ent = ENTITIES[rng.next() % len(ENTITIES)]
    n_paras = rng.randint(2, 5)
    paras = []
    for _ in range(n_paras):
        words = [rng.choice(_FILLER) for _ in range(rng.randint(8, 20))]
        # embed 1-3 entity mentions per paragraph
        for _ in range(rng.randint(1, 3)):
            ent = ENTITIES[rng.next() % len(ENTITIES)]
            surface = ent[2][rng.next() % len(ent[2])]
            pos = rng.next() % (len(words) + 1)
            words.insert(pos, surface)
        paras.append(" ".join(words))
    if i % 100 == 0:
        # hot-skew rows always mention the dominant entity
        paras.append("A tribute to Ada Lovelace and the analytical engine legacy.")

    title = f"{title_ent[0].replace('_', ' ')} — site{0 if i % 100 == 0 else i % 997} archive"
    body_paras = "\n".join(f"<p>{p}</p>" for p in paras)
    anchor = f'<a href="https://site{rng.next() % 997}.example.org/page/{rng.next() % 100000}">related</a>'
    html = (
        "<html><head>"
        f"<title>{title}</title>"
        '<script type="text/javascript">var x = 1 &amp;&amp; 2;</script>'
        "<style>.nav{color:#333}</style>"
        "</head><body>"
        '<nav class="nav">Home | Archive | About</nav>'
        f"<h1>{title}</h1>\n{body_paras}\n{anchor}"
        "<footer>&copy; 2025 example.org &nbsp;crawl</footer>"
        "</body></html>"
    )
    if i % 101 == 100:  # malformed-markup variant
        html = html.replace("</p>", "", 1).replace("</body></html>", "<div><span>")
    return html.encode("utf-8")


def page_row(i: int) -> tuple:
    html = render_html(i)
    return (
        page_url(i),
        _EPOCH + timedelta(seconds=(i * 7919) % 31_536_000),
        html,
        extract_text(html),
        page_lang(i),
    )


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def synthesize_pages(spark, n: int, partitions: int | None = None):
    """Distributed deterministic pages table (see module docstring)."""
    import pandas as pd

    # the mapInPandas closure imports sparkrdf on executors — ship the
    # package for sessions launched without --py-files (callers that never
    # go through hashing.register_udfs would otherwise fail off-CWD)
    from sparkrdf.session import ensure_pyfiles

    ensure_pyfiles(spark)

    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches):
        for pdf in batches:
            rows = [page_row(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, PAGES_SCHEMA)
