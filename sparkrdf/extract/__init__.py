"""Web-scale triple-extraction pipeline over Common-Crawl-style pages.

Stages (all Arrow/pandas-UDF batch transforms or built-in columns — no
per-row Python UDFs):
  html_text  — deterministic HTML → text extraction (byte-identical per url)
  gazetteer  — fixed entity dictionary + ontology (canonical IRIs, classes)
  ner        — batched mention detection (regex over Arrow batches)
  link       — dictionary + deterministic-embedding cosine scoring
  mint       — IRI minting / skolemization (farmhash-stable ids)
  canon      — predicate canonicalization against the broadcast ontology map
  pipeline   — end-to-end: pages table → statements DataFrame → RPT/PGT
"""
