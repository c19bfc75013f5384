"""Query-side operators over statement/edge tables: basic-graph-pattern
matching and bounded traversal.

These are the reads an ArangoRDF user runs AFTER import — AQL traversals
(``FOR v IN 1..k ANY start ...``) and pattern queries over the stored graph
(reference: arango_rdf/main.py materializes collections precisely so such
queries can run). Re-expressed as DataFrame joins so Catalyst pushes the
constant-term filters into the scan and AQE sizes the joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_var(term: str) -> bool:
    return term.startswith("?")


#: hidden per-variable term-metadata column suffixes bound by
#: ``bgp_match(term_meta=True)`` and consumed by the SPARQL term functions
META_SUFFIXES = ("__kind", "__lang", "__dt")


def bgp_match(
    stmts: DataFrame,
    patterns: list[tuple],
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    g_col: str = "sub_graph",
    term_meta: bool = False,
) -> DataFrame:
    """Match a conjunctive basic graph pattern (SPARQL BGP semantics, bag
    solutions) against a statements table. Each pattern term is either a
    constant string or a variable ``"?name"``; the result has one column
    per distinct variable, named without the ``?``. A pattern may also be
    a QUAD ``(s, p, o, g)`` — SPARQL's ``GRAPH g {{ ... }}`` — matching the
    ``g_col`` named-graph column (a constant graph IRI filters to that
    graph; a variable binds it; default-graph rows hold NULL there and are
    matched by neither, per the dataset semantics).

    Dataset semantics of bare TRIPLE patterns: they match rows from ALL
    graphs (default + every named graph) — the "union default graph"
    convention (what most stores, e.g. Virtuoso, default to), NOT strict
    SPARQL where non-GRAPH patterns see only the unnamed graph. If the
    same triple exists in several named graphs, mixing triple and quad
    patterns multiplies solution multiplicities accordingly; restrict to
    the unnamed graph by pre-filtering ``stmts.filter(col(g_col).isNull())``
    when strict semantics are needed.

    Scale shape: every pattern is an independent filtered projection of the
    statements scan — constant terms become pushed-down predicates, so a
    selective pattern reads a fraction of the table. Patterns join
    progressively on their shared variables (plain equi-joins, AQE-sized);
    they are reordered most-constants-first so the most selective scan
    seeds the join tree. A pattern sharing no variable with the accumulated
    bindings is a cartesian blow-up and raises instead of silently
    crossJoining; a pattern with NO variables acts as an existence gate
    (broadcast 1-row semi-filter), not a multiplier.

    ``term_meta=True`` additionally binds, per variable, the hidden term
    metadata columns ``{var}__kind`` / ``{var}__lang`` / ``{var}__dt``
    (from the canonical statement schema's s_kind / o_kind / o_lang /
    o_datatype columns; predicate- and graph-position variables are always
    IRIs) — what the SPARQL term functions ``lang() datatype() isIRI()
    isBlank() isLiteral() isNumeric() sameTerm()`` evaluate against.  On a
    shared variable the FIRST binding pattern's metadata wins (joins stay
    on the lexical form — the engine's existing join semantics, unchanged).
    """
    if not patterns:
        raise ValueError("bgp_match requires at least one pattern")

    cols = {"s": s_col, "p": p_col, "o": o_col, "g": g_col}

    def meta_exprs(var: str, pos: str) -> list:
        if pos == "s":
            src = [F.col("s_kind"), F.lit(None), F.lit(None)]
        elif pos == "o":
            src = [F.col("o_kind"), F.col("o_lang"), F.col("o_datatype")]
        else:  # p, g positions are always IRIs
            src = [F.lit("URIRef"), F.lit(None), F.lit(None)]
        return [c.cast("string").alias(f"{var}{m}")
                for c, m in zip(src, META_SUFFIXES)]

    def project(pat):
        if len(pat) not in (3, 4):
            raise ValueError(f"pattern must be a triple or quad, got {pat!r}")
        df = stmts
        seen: dict[str, str] = {}  # var -> first source column
        out = []
        for pos, term in zip(("s", "p", "o", "g"), pat):
            col = cols[pos]
            if not _is_var(term):
                df = df.filter(F.col(col) == term)
            else:
                if pos == "g":
                    # GRAPH ?g ranges over NAMED graphs only: default-graph
                    # rows (NULL) never bind a graph variable (SPARQL 1.1
                    # §13.3) — and an unfiltered NULL would poison joins
                    df = df.filter(F.col(col).isNotNull())
                var = term[1:]
                if var in seen:  # repeated var inside one pattern
                    df = df.filter(F.col(col) == F.col(seen[var]))
                else:
                    seen[var] = col
                    out.append(F.col(col).alias(var))
                    if term_meta:
                        out.extend(meta_exprs(var, pos))
        return df.select(*out), set(seen)

    def pat_vars(pat):
        return {t[1:] for t in pat if _is_var(t)}

    def n_consts(pat):
        return sum(not _is_var(t) for t in pat)

    # greedy connected ordering: seed with the most-constant (most
    # selective) pattern, then always extend with a pattern sharing a bound
    # variable, again most-constants-first (ties keep user order). Only a
    # genuinely disconnected pattern set raises.
    pending = [(i, p) for i, p in enumerate(patterns) if pat_vars(p)]
    gates = [p for p in patterns if not pat_vars(p)]  # var-free existence
    acc: DataFrame | None = None
    bound: set[str] = set()
    while pending:
        if acc is None:
            candidates = pending
        else:
            candidates = [ip for ip in pending if bound & pat_vars(ip[1])]
            if not candidates:
                raise ValueError(
                    f"patterns {[p for _, p in pending]} share no variable "
                    "with prior patterns (cartesian product); bind a "
                    "variable to connect them"
                )
        pick = min(candidates, key=lambda ip: (3 - n_consts(ip[1]), ip[0]))
        pending.remove(pick)
        proj, vars_ = project(pick[1])
        if acc is None:
            acc, bound = proj, vars_
        else:
            if term_meta:
                # first-binding-wins: an already-bound shared variable keeps
                # the accumulated side's metadata columns
                dup = [f"{v}{m}" for v in (bound & vars_) for m in META_SUFFIXES]
                proj = proj.drop(*dup)
            acc = acc.join(proj, on=sorted(bound & vars_))
            bound |= vars_
    gates = [project(g)[0] for g in gates]
    if acc is None:
        acc = gates.pop(0).limit(1).select(F.lit(True).alias("matched"))
    for g in gates:
        # existence gate: keep all bindings iff the constant triple exists
        acc = acc.join(F.broadcast(g.limit(1).select(F.lit(1).alias("_g"))))
        acc = acc.drop("_g")
    return acc


def khop(
    edges: DataFrame,
    source: str,
    k: int,
    src: str = "u",
    dst: str = "v",
    directed: bool = False,
) -> DataFrame:
    """BFS distances ≤ k from ``source``: returns ``(n, dist)`` with the
    minimum hop count, one row per reached vertex. ``directed=False``
    walks edges both ways (AQL's ``ANY`` direction).

    Scale shape: classic frontier expansion — each level joins ONLY the
    current frontier (narrow, shrinking) against the static edge table and
    anti-joins the visited set; the edge table is repartitioned on its join
    key once and reused every level. Frontiers are eagerly checkpointed so
    lineage stays O(1) per level instead of O(k) at the end.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    if not directed:
        e = e.unionAll(e.select(F.col("t").alias("s"), F.col("s").alias("t")))
    e = e.repartition("s").persist()

    spark = edges.sparkSession
    frontier = spark.createDataFrame([(source,)], "n string").localCheckpoint(
        eager=True
    )
    visited = frontier.select("n", F.lit(0).alias("dist"))
    for depth in range(1, k + 1):
        frontier = (
            e.join(frontier, e["s"] == frontier["n"])
            .select(F.col("t").alias("n"))
            .dropDuplicates()
            .join(visited.select("n"), "n", "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        visited = visited.unionAll(
            frontier.select("n", F.lit(depth).alias("dist"))
        ).localCheckpoint(eager=True)
    e.unpersist()
    return visited


def _closure_local(pairs: list[tuple], cap: int) -> list[tuple] | None:
    """Exact transitive closure of a small pair list on the driver (per-source
    DFS over the adjacency map) — the same threshold-gated fast-path pattern
    as ``sparkrdf.dedupe.connected_components``. Returns None when the closure
    would exceed ``cap`` rows, signalling the caller to fall back to the
    distributed doubling loop (driver memory stays bounded by construction)."""
    adj: dict = {}
    for s, o in pairs:
        adj.setdefault(s, set()).add(o)
    out: list[tuple] = []
    for src0 in adj:
        seen: set = set()
        stack = list(adj[src0])
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            stack.extend(adj.get(x, ()))
        out.extend((src0, o) for o in seen)
        if len(out) > cap:
            return None
    return out


def path_closure(
    edges: DataFrame, src: str = "s", dst: str = "o", max_doubling: int = 6,
    local_threshold: int | None = None,
) -> DataFrame:
    """Transitive closure of a binary relation — the SPARQL ``p+`` property
    path / AQL unbounded traversal, as a set: every ``(s, o)`` with a
    directed path s→…→o. Returns distinct ``(s, o)`` pairs.

    Iterative doubling: R ← R ∪ (R ∘ R) squares the reachable path length
    each round, so ``max_doubling`` = 6 covers paths up to 2^6 = 64 edges in
    six self-joins — the textbook trick that beats one-edge-at-a-time
    frontier expansion by an exponential factor on deep chains (khop above
    stays the tool when per-level DISTANCES matter). Converges early (and
    stops) when a round adds nothing; raises if the bound is exhausted
    while still growing, so a silently truncated closure can never leak
    out. Each round is two shuffles (join + distinct) on uniformly-hashed
    endpoint keys, lineage truncated per round.
    """
    r = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("o"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    n = r.count()
    # Threshold-gated driver fast path (the connected_components pattern):
    # ontology/taxonomy-sized relations — the dominant caller profile, e.g.
    # rdfs_materialize's subclass/subproperty hierarchies — close in one
    # driver pass instead of O(log depth) join+dedup+count Spark jobs. The
    # result-size cap bounds driver memory; exceeding either threshold falls
    # through to the distributed doubling loop, so 100 TB inputs never land
    # on the driver. SPARKRDF_LOCAL_CLOSURE_MAX=0 disables the fast path.
    if local_threshold is None:
        import os

        local_threshold = int(os.environ.get("SPARKRDF_LOCAL_CLOSURE_MAX", "20000"))
    if n <= local_threshold:
        closed = _closure_local(
            [(row["s"], row["o"]) for row in r.collect()],
            cap=max(50 * local_threshold, 1_000_000),
        )
        if closed is not None:
            from sparkrdf.localdf import local_rows_df

            return local_rows_df(edges.sparkSession, closed, r.schema)
    for _ in range(max_doubling):
        a, b = r.alias("a"), r.alias("b")
        stepped = a.join(b, F.col("a.o") == F.col("b.s")).select(
            F.col("a.s").alias("s"), F.col("b.o").alias("o")
        )
        merged = r.unionByName(stepped).dropDuplicates().localCheckpoint(eager=True)
        m = merged.count()
        if m == n:
            return merged
        r, n = merged, m
    raise RuntimeError(
        f"path_closure still growing after {max_doubling} doubling rounds "
        f"(paths beyond 2^{max_doubling} edges); raise max_doubling"
    )


def _tokenize_path(expr: str) -> list[str]:
    toks: list[str] = []
    i, n = 0, len(expr)
    while i < n:
        c = expr[i]
        if c.isspace():
            i += 1
        elif c in "/|^()*+?!":
            toks.append(c)
            i += 1
        elif c == "<":
            j = expr.find(">", i)
            if j < 0:
                raise ValueError(f"unterminated <iri> at offset {i} in path {expr!r}")
            toks.append(expr[i + 1 : j])
            i = j + 1
        else:
            j = i
            while j < n and not expr[j].isspace() and expr[j] not in "/|^()*+?!<>":
                j += 1
            toks.append(expr[i:j])
            i = j
    return toks


def parse_path(expr: str):
    """Parse a SPARQL 1.1 property-path expression (§9.1 grammar subset)
    into an AST of tuples. Supported: IRIs (bare or ``<...>``), inverse
    ``^p``, sequence ``a/b``, alternative ``a|b``, closures ``p* p+ p?``,
    forward negated property sets ``!p`` / ``!(p1|p2)``, and grouping.
    Precedence mirrors the spec: ``|`` < ``/`` < ``^`` < postfix mods.
    """
    toks = _tokenize_path(expr)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = peek()
        pos += 1
        return t

    def alternative():
        node = sequence()
        while peek() == "|":
            take()
            node = ("alt", node, sequence())
        return node

    def sequence():
        node = elt_or_inverse()
        while peek() == "/":
            take()
            node = ("seq", node, elt_or_inverse())
        return node

    def elt_or_inverse():
        if peek() == "^":
            take()
            return ("inv", elt())
        return elt()

    def elt():
        node = primary()
        while peek() in ("*", "+", "?"):
            node = ({"*": "star", "+": "plus", "?": "opt"}[take()], node)
        return node

    def primary():
        t = take()
        if t is None:
            raise ValueError(f"unexpected end of path expression {expr!r}")
        if t == "(":
            node = alternative()
            if take() != ")":
                raise ValueError(f"missing ')' in path {expr!r}")
            return node
        if t == "!":
            return ("neg", negated_set())
        if t in "/|^)*+?":
            raise ValueError(f"unexpected {t!r} in path {expr!r}")
        return ("pred", t)

    def negated_set():
        t = take()
        if t == "(":
            iris = []
            while True:
                it = take()
                if it is None or it in "/|^()!*+?":
                    raise ValueError(f"bad negated property set in {expr!r}")
                iris.append(it)
                sep = take()
                if sep == ")":
                    return iris
                if sep != "|":
                    raise ValueError(f"bad negated property set in {expr!r}")
        if t is None or t in "/|^()!*+?":
            raise ValueError(f"bad negated property set in {expr!r}")
        return [t]

    node = alternative()
    if pos != len(toks):
        raise ValueError(f"trailing tokens {toks[pos:]} in path {expr!r}")
    return node


def path_expr(
    stmts: DataFrame,
    expr: str,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    max_doubling: int = 6,
) -> DataFrame:
    """Evaluate a SPARQL 1.1 property-path expression against a statements
    table, returning the ``(s, o)`` endpoint relation. Complements
    :func:`path_closure` (the bare ``p+`` case) with the full §9.1 algebra:
    inverse, sequence, alternative, ``* + ?`` closures, and negated
    property sets. Semantics follow the spec: sequence/alternative/inverse
    are multiset operators (compiled to joins / UNION ALL, so an engine
    comparing bags agrees), while the unbounded operators ``* + ?`` are
    set-valued (ArbitraryLengthPath is defined via node reachability, not
    path counting — the spec's fix for the path-counting explosion).
    Zero-length paths (``*``/``?``) connect every graph node — every
    subject or object of the FULL statements table — to itself, the
    both-ends-unbound evaluation of ZeroOrMorePath.

    Scale shape: each ``pred`` leaf is a pushed-down filter on the
    statements scan (predicate constants reach parquet); sequence is an
    equi-join on the shared endpoint (AQE-sized); alternative is a
    zero-shuffle UNION ALL; ``+``/``*`` delegate to iterative-doubling
    :func:`path_closure` (O(log path-length) self-joins, early-converging,
    raises rather than silently truncating). The node table for
    zero-length paths is one distinct over endpoint columns — reused via
    closure, never recomputed per operator node. When the parsed tree
    references the statements table more than once (any non-trivial path:
    a sequence, an alternative, or a zero-length operator's node table),
    the projected table is materialized ONCE (eager localCheckpoint) —
    statements tables are usually the tail of an extraction pipeline, not
    a base table, and an unmaterialized plan re-runs that pipeline per
    leaf (measured: a 3-leaf path over the doc-KG compiled to 62
    exchanges, ~6 full re-derivations).
    """
    tree = parse_path(expr) if isinstance(expr, str) else expr

    def _n_refs(node) -> int:
        kind = node[0]
        if kind in ("pred", "neg"):
            return 1
        if kind in ("inv", "plus"):
            return _n_refs(node[1])
        if kind in ("seq", "alt"):
            return _n_refs(node[1]) + _n_refs(node[2])
        if kind in ("star", "opt"):  # zero-length arm scans base twice more
            return _n_refs(node[1]) + 2
        raise ValueError(f"unknown path node {node!r}")

    base = stmts.select(F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o"))
    if _n_refs(tree) > 1:
        base = base.localCheckpoint(eager=True)
    nodes = None  # lazily-built zero-length-path node table

    def graph_nodes() -> DataFrame:
        nonlocal nodes
        if nodes is None:
            nodes = (
                base.select(F.col("s").alias("n"))
                .unionAll(base.select(F.col("o").alias("n")))
                .dropDuplicates()
            )
        return nodes

    def identity() -> DataFrame:
        n = graph_nodes()
        return n.select(F.col("n").alias("s"), F.col("n").alias("o"))

    def ev(node) -> DataFrame:
        kind = node[0]
        if kind == "pred":
            return base.filter(F.col("p") == node[1]).select("s", "o")
        if kind == "neg":
            return base.filter(~F.col("p").isin(list(node[1]))).select("s", "o")
        if kind == "inv":
            return ev(node[1]).select(F.col("o").alias("s"), F.col("s").alias("o"))
        if kind == "seq":
            a, b = ev(node[1]).alias("a"), ev(node[2]).alias("b")
            return a.join(b, F.col("a.o") == F.col("b.s")).select(
                F.col("a.s").alias("s"), F.col("b.o").alias("o")
            )
        if kind == "alt":
            return ev(node[1]).unionAll(ev(node[2]))
        if kind == "plus":
            return path_closure(ev(node[1]).dropDuplicates(), max_doubling=max_doubling)
        if kind == "star":
            plus = path_closure(ev(node[1]).dropDuplicates(), max_doubling=max_doubling)
            return plus.unionAll(identity()).dropDuplicates()
        if kind == "opt":
            return ev(node[1]).unionAll(identity()).dropDuplicates()
        raise ValueError(f"unknown path node {node!r}")

    return ev(tree)


def bgp_optional(
    stmts: DataFrame,
    patterns: list[tuple[str, str, str]],
    optional: list[tuple[str, str, str]],
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """SPARQL ``OPTIONAL`` (left-join) semantics over two basic graph
    patterns: solutions of ``patterns`` extended with the bindings of
    ``optional`` where the optional group matches, NULL-padded where it
    does not — "all documents, with their mentions if any". Restricted to
    the *well-designed* case (Pérez, Arenas & Gutierrez 2009): the two
    groups must share at least one variable, so the semantics is exactly a
    relational left outer join and never the non-monotone surprise of
    disconnected OPTIONALs.

    Scale shape: both groups compile through :func:`bgp_match` (pushed-down
    constant filters, most-selective-first join order); the final left join
    is an equi-join on the shared variables — AQE-sized like any other.
    """
    req = bgp_match(stmts, patterns, s_col=s_col, p_col=p_col, o_col=o_col)
    opt = bgp_match(stmts, optional, s_col=s_col, p_col=p_col, o_col=o_col)
    shared = sorted(set(req.columns) & set(opt.columns))
    if not shared:
        raise ValueError(
            "optional group shares no variable with the required group "
            "(not well-designed; the result would be a cartesian pad)"
        )
    return req.join(opt, shared, "left")


def bgp_union(
    stmts: DataFrame,
    groups: list[list[tuple[str, str, str]]],
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """SPARQL ``UNION`` over basic graph patterns: the bag union of the
    solution multisets of each group (SPARQL 1.1 §18.5 — UNION is
    multiset-additive, so duplicates across branches are KEPT). Groups may
    bind different variable sets; variables absent from a branch are
    NULL-padded, exactly the spec's unbound-variable semantics.

    Scale shape: each branch compiles through :func:`bgp_match` (its own
    pushed-down scans and join tree); the union itself is a zero-shuffle
    ``unionByName`` — branches stay partition-parallel and nothing
    re-exchanges until a downstream operator asks for a key.
    """
    if not groups:
        raise ValueError("bgp_union requires at least one group")
    sols = [bgp_match(stmts, g, s_col=s_col, p_col=p_col, o_col=o_col) for g in groups]
    acc = sols[0]
    for nxt in sols[1:]:
        acc = acc.unionByName(nxt, allowMissingColumns=True)
    return acc


def bgp_minus(
    stmts: DataFrame,
    patterns: list[tuple[str, str, str]],
    minus: list[tuple[str, str, str]],
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """SPARQL ``MINUS`` (SPARQL 1.1 §18.5 Minus): keep the left solutions
    that are NOT compatible with any right solution on a shared variable.
    Inside pure BGPs every pattern variable is bound, so compatibility on
    the shared variables is plain equality and MINUS compiles to a
    left-anti equi-join. The spec's edge case is honored: with NO shared
    variables, ``dom(mu1) ∩ dom(mu2) = ∅`` means nothing is removed (unlike
    ``FILTER NOT EXISTS``), so the left side is returned unchanged.

    Scale shape: two independent BGP join trees, then ONE left-anti
    shuffle on the shared variables — the anti side is only as wide as the
    shared-variable key, and AQE broadcast-converts it when small.
    """
    left = bgp_match(stmts, patterns, s_col=s_col, p_col=p_col, o_col=o_col)
    right = bgp_match(stmts, minus, s_col=s_col, p_col=p_col, o_col=o_col)
    shared = sorted(set(left.columns) & set(right.columns))
    if not shared:
        return left  # disjoint domains: SPARQL MINUS removes nothing
    return left.join(right.select(*shared).dropDuplicates(shared), shared, "left_anti")


def bgp_values(
    stmts: DataFrame,
    patterns: list[tuple[str, str, str]],
    values: list[dict],
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """SPARQL ``VALUES`` (inline data, SPARQL 1.1 §10.2): join the BGP
    solutions with an explicit solution sequence. Each element of
    ``values`` maps variable name → constant, with ``None`` standing for
    ``UNDEF`` (compatible with ANY binding of that variable, per the
    spec's compatibility relation). Rows contribute multiplicity: a
    constant row matching k solutions yields k rows, and duplicate VALUES
    rows duplicate solutions (bag semantics).

    Scale shape: the inline table is driver-literal and broadcast by
    construction. Without UNDEF it is a broadcast hash equi-join on the
    bound variables; with UNDEF the per-variable predicate becomes
    ``value IS NULL OR value = var`` — a broadcast nested-loop over a
    table of len(values) rows, which is bounded by the query text itself,
    never by the data.
    """
    if not values:
        raise ValueError("bgp_values requires at least one VALUES row")
    vars_ = sorted({k for row in values for k in row})
    sol = bgp_match(stmts, patterns, s_col=s_col, p_col=p_col, o_col=o_col)
    missing = [v for v in vars_ if v not in sol.columns]
    if missing:
        raise ValueError(f"VALUES variables {missing} not bound by the pattern group")
    spark = stmts.sparkSession
    rows = [tuple(row.get(v) for v in vars_) for row in values]
    inline = spark.createDataFrame(
        rows, ", ".join(f"`__v_{v}` string" for v in vars_)
    )
    has_undef = any(v is None for r in rows for v in r)
    if not has_undef:
        cond = [F.col(f"__v_{v}") == F.col(v) for v in vars_]
    else:
        cond = [
            F.col(f"__v_{v}").isNull() | (F.col(f"__v_{v}") == F.col(v))
            for v in vars_
        ]
    pred = cond[0]
    for c in cond[1:]:
        pred = pred & c
    joined = sol.join(F.broadcast(inline), pred)
    return joined.drop(*[f"__v_{v}" for v in vars_])


def construct_triples(
    stmts: DataFrame,
    patterns: list[tuple[str, str, str]],
    template: list[tuple[str, str, str]],
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """SPARQL ``CONSTRUCT``: instantiate a triple template once per BGP
    solution and return the resulting GRAPH — a set of (s, p, o) rows
    (CONSTRUCT output is an RDF graph, so duplicates collapse; SPARQL 1.1
    §16.2). Template terms are constants or ``?var`` bound by the
    pattern group; per the spec, an instantiation with an unbound (NULL)
    term emits no triple rather than a partial one.

    Scale shape: the solution relation is computed once (one BGP join
    tree); each template row is a pure projection of it, combined with a
    zero-shuffle union; the single shuffle is the final distinct on
    (s, p, o) — the same dedup exchange every statement producer in this
    engine ends with, so a downstream rpt/pgt_transform can reuse it.
    """
    if not template:
        raise ValueError("construct_triples requires a non-empty template")
    sol = bgp_match(stmts, patterns, s_col=s_col, p_col=p_col, o_col=o_col)
    outs = []
    for s, p, o in template:
        cols = []
        for name, term in zip(("s", "p", "o"), (s, p, o)):
            if _is_var(term):
                var = term[1:]
                if var not in sol.columns:
                    raise ValueError(f"template variable ?{var} not bound by patterns")
                cols.append(F.col(var).alias(name))
            else:
                cols.append(F.lit(term).alias(name))
        proj = sol.select(*cols)
        outs.append(proj.filter(
            F.col("s").isNotNull() & F.col("p").isNotNull() & F.col("o").isNotNull()
        ))
    acc = outs[0]
    for nxt in outs[1:]:
        acc = acc.unionByName(nxt)
    return acc.dropDuplicates(["s", "p", "o"])


def describe_cbd(
    stmts: DataFrame,
    subjects: DataFrame,
    s_col: str = "s",
    o_col: str = "o",
    o_kind_col: str = "o_kind",
    bnode_kind: str = "BNode",
    max_rounds: int = 10,
    small_graph_threshold: int = 2_000_000,
) -> DataFrame:
    """SPARQL ``DESCRIBE`` as a Concise Bounded Description (CBD): for every
    seed resource, its outgoing statements plus — recursively — the
    statements of every BLANK NODE reached in object position. Blank nodes
    have no global identity, so a resource's description is incomplete
    without them (nested property lists, RDF collections, reified/n-ary
    structures); IRI and literal objects stop the recursion, per the CBD
    spec. ``subjects`` is a one-column DataFrame of seed terms; the result
    keeps the full input statement schema.

    Scale shape: the subject SET is grown khop-style — each round one
    left-semi join of the statements table against the (narrow, typically
    shrinking) frontier, a bnode-object projection, and an anti-join
    against the visited set, frontier checkpointed per round so lineage
    stays O(1). The final output is ONE left-semi join of the statements
    table against the accumulated subject set — statements rows are never
    duplicated or widened mid-loop. Depth is bounded by the deepest bnode
    chain (data, not corpus, sized); exhausting ``max_rounds`` RAISES
    rather than returning a silently truncated description.

    Threshold-gated driver fast path (the connected_components pattern):
    when the materialized bnode-edge and seed tables are both under
    ``small_graph_threshold`` rows, the BFS runs as a driver loop — the
    identical frontier/visited set algebra, integer-free and
    order-independent — and only the final semi-join stays distributed.
    Larger inputs take the per-round join loop automatically.
    """
    seed_col = subjects.columns[0]
    visited = (
        subjects.select(F.col(seed_col).alias("n"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    # the loop consumes only the (subject, bnode-object) edges; persist that
    # narrow projection so each round joins a cached table instead of
    # re-deriving the full statements pipeline per round (the final output
    # semi-join below is the one full derivation)
    bn_edges = (
        stmts.filter(F.col(o_kind_col) == bnode_kind)
        .select(F.col(s_col).alias("_s"), F.col(o_col).alias("_o"))
        .persist()
    )
    if (
        bn_edges.count() <= small_graph_threshold
        and visited.count() <= small_graph_threshold
    ):
        adj: dict = {}
        for r in bn_edges.collect():
            adj.setdefault(r["_s"], []).append(r["_o"])
        bn_edges.unpersist()
        vis = {r["n"] for r in visited.collect()}
        frontier_set = vis
        for _ in range(max_rounds):
            new = {
                o
                for s in frontier_set
                for o in adj.get(s, ())
                if o not in vis
            }
            if not new:
                visited_df = stmts.sparkSession.createDataFrame(
                    [(v,) for v in sorted(vis)], visited.schema
                )
                return stmts.join(
                    visited_df, stmts[s_col] == visited_df["n"], "left_semi"
                )
            vis |= new
            frontier_set = new
        raise RuntimeError(
            f"describe_cbd blank-node closure deeper than {max_rounds} rounds; "
            "raise max_rounds"
        )
    try:
        frontier = visited
        for _ in range(max_rounds):
            reached = (
                bn_edges.join(frontier, bn_edges["_s"] == frontier["n"], "left_semi")
                .select(F.col("_o").alias("n"))
                .dropDuplicates()
                .join(visited, "n", "left_anti")
                .localCheckpoint(eager=True)
            )
            if reached.isEmpty():
                return stmts.join(
                    visited, stmts[s_col] == visited["n"], "left_semi"
                )
            # union of checkpointed frontiers — no checkpoint of the set needed
            visited = visited.unionAll(reached)
            frontier = reached
        raise RuntimeError(
            f"describe_cbd blank-node closure deeper than {max_rounds} rounds; "
            "raise max_rounds"
        )
    finally:
        bn_edges.unpersist()


def bgp_not_exists(
    stmts: DataFrame,
    patterns: list[tuple],
    negated: list[tuple],
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    g_col: str = "sub_graph",
) -> DataFrame:
    """SPARQL ``FILTER NOT EXISTS`` over two BGP groups: keep the left
    solutions for which the negated group, with the shared variables
    substituted, matches nothing. NOT the same operator as
    :func:`bgp_minus` — the spec's (famous) divergence is the
    no-shared-variable case: MINUS removes nothing (disjoint domains are
    never "compatible"), while NOT EXISTS still evaluates the inner group
    and removes EVERY solution if it matches at all (SPARQL 1.1 §8.3.3
    gives the ``?x != ?y`` example where the two differ). With shared
    variables and pure BGPs, both compile to a left-anti equi-join.

    Scale shape: shared-variable case is ONE left-anti shuffle on the
    shared keys (anti side deduped and only key-wide, AQE
    broadcast-converts it); the no-shared-variable case is a broadcast
    1-row existence gate — ``limit(1)`` on the inner group, never a
    per-row correlated re-evaluation.
    """
    left = bgp_match(stmts, patterns, s_col=s_col, p_col=p_col, o_col=o_col,
                     g_col=g_col)
    right = bgp_match(stmts, negated, s_col=s_col, p_col=p_col, o_col=o_col,
                      g_col=g_col)
    shared = sorted(set(left.columns) & set(right.columns))
    if shared:
        return left.join(
            right.select(*shared).dropDuplicates(shared), shared, "left_anti"
        )
    # uncorrelated NOT EXISTS: all-or-nothing on the inner group's existence
    probe = right.limit(1).select(F.lit(1).alias("_ne"))
    return (
        left.join(F.broadcast(probe), how="left")
        .filter(F.col("_ne").isNull())
        .drop("_ne")
    )


def group_solutions(
    stmts: DataFrame,
    patterns: list[tuple],
    group_by: list[str],
    aggregates: dict[str, tuple[str, str]],
    having: str | None = None,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    g_col: str = "sub_graph",
) -> DataFrame:
    """SPARQL 1.1 aggregation (§18.5.1 Group/Aggregation) over a BGP's
    solution multiset: ``GROUP BY`` the named variables, compute each
    ``alias -> (function, variable)`` aggregate (COUNT / COUNT_DISTINCT /
    SUM / AVG / MIN / MAX / SAMPLE / GROUP_CONCAT — ``COUNT`` with
    variable ``"*"`` counts solutions; GROUP_CONCAT takes an optional
    third tuple element, the separator, default ``" "`` per §18.5.1.7),
    then apply the optional ``HAVING`` expression (a SQL boolean over
    group keys and aliases). Numeric aggregates cast the lexical form to
    double, SPARQL's simple-literal arithmetic. Two determinism choices
    the spec leaves open: SAMPLE picks MIN (any value is conformant) and
    GROUP_CONCAT concatenates in sorted order (the spec fixes no order) —
    both so repeated runs and distributed re-partitions agree.

    Scale shape: the BGP join tree feeds ONE hash aggregate keyed on the
    group variables — partial (map-side) aggregation applies to every
    supported function, so the exchange carries one row per (key, partial)
    not per solution; HAVING is a post-aggregation filter, never a second
    shuffle.
    """
    sol = bgp_match(stmts, patterns, s_col=s_col, p_col=p_col, o_col=o_col,
                    g_col=g_col)
    missing = [v for v in group_by if v not in sol.columns]
    if missing:
        raise ValueError(f"GROUP BY variables {missing} not bound by the patterns")
    fns = {
        "count": lambda c, sep: F.count(F.lit(1)) if c == "*" else F.count(c),
        "count_distinct": lambda c, sep: F.count_distinct(F.col(c)),
        "sum": lambda c, sep: F.sum(F.col(c).cast("double")),
        "avg": lambda c, sep: F.avg(F.col(c).cast("double")),
        "min": lambda c, sep: F.min(c),
        "max": lambda c, sep: F.max(c),
        "sample": lambda c, sep: F.min(c),
        "group_concat": lambda c, sep: F.array_join(
            F.array_sort(F.collect_list(c)), sep
        ),
    }
    aggs = []
    for alias, spec in aggregates.items():
        fn, var = spec[0], spec[1]
        sep = spec[2] if len(spec) > 2 else " "
        key = fn.lower()
        if key not in fns:
            raise ValueError(f"unsupported aggregate {fn!r} (have {sorted(fns)})")
        if var == "*" and key != "count":
            raise ValueError(f"aggregate {fn!r} cannot take '*' (only count)")
        if var != "*" and var not in sol.columns:
            raise ValueError(f"aggregate variable ?{var} not bound by the patterns")
        aggs.append(fns[key](var, sep).alias(alias))
    if not aggs:
        raise ValueError("group_solutions requires at least one aggregate")
    out = sol.groupBy(*group_by).agg(*aggs)
    return out.filter(having) if having else out


# --- SPARQL FILTER expressions + solution modifiers (§17.2, §15) ---


def _tokenize_expr(expr: str) -> list[tuple[str, object]]:
    """Tokenize a SPARQL FILTER expression: variables, numeric and string
    literals, booleans, function names, comparison/logical operators,
    parens and commas."""
    import re as _re

    toks: list[tuple[str, object]] = []
    i, n = 0, len(expr)
    while i < n:
        c = expr[i]
        if c.isspace():
            i += 1
            continue
        if c == "?":
            m = _re.match(r"\?(\w+)", expr[i:])
            if not m:
                raise ValueError(f"bad variable at offset {i} in {expr!r}")
            toks.append(("var", m.group(1)))
            i += m.end()
        elif c in "\"'":
            j = i + 1
            out = []
            while j < n and expr[j] != c:
                if expr[j] == "\\" and j + 1 < n:
                    out.append(expr[j + 1])
                    j += 2
                else:
                    out.append(expr[j])
                    j += 1
            if j >= n:
                raise ValueError(f"unterminated string at offset {i} in {expr!r}")
            toks.append(("str", "".join(out)))
            i = j + 1
        elif c.isdigit() or (
            c in "+-"
            and i + 1 < n
            and (expr[i + 1].isdigit() or expr[i + 1] == ".")
            # '+/-' is a SIGN only when it cannot continue a value: after a
            # variable, literal or ')' it is the binary arithmetic operator
            # (so '?n-1' parses as ?n minus 1, not ?n followed by -1)
            and not (
                toks and (toks[-1][0] in ("var", "num", "str", "bool")
                          or toks[-1] == ("op", ")"))
            )
        ):
            m = _re.match(r"[+-]?\d*\.?\d+(?:[eE][+-]?\d+)?", expr[i:])
            toks.append(("num", float(m.group(0))))
            i += m.end()
        elif expr[i : i + 2] in ("&&", "||", "!=", "<=", ">="):
            toks.append(("op", expr[i : i + 2]))
            i += 2
        elif c in "=<>!(),+-*/":
            toks.append(("op", c))
            i += 1
        else:
            m = _re.match(r"[A-Za-z_][A-Za-z0-9_]*", expr[i:])
            if not m:
                raise ValueError(f"bad token at offset {i} in {expr!r}")
            word = m.group(0)
            if word.lower() in ("true", "false"):
                toks.append(("bool", word.lower() == "true"))
            else:
                toks.append(("fn", word.lower()))
            i += m.end()
    return toks


def parse_filter(expr: str):
    """Parse a SPARQL FILTER / value expression (§17.2–§17.4 subset) into
    an AST of tuples. Supported: ``&& || !``, comparisons ``= != < <= >
    >=``, ``IN / NOT IN`` lists, arithmetic ``+ - * /``, the boolean
    functions ``regex(?v, pat[, flags])``, ``bound(?v)``,
    ``contains/strstarts/strends(?v, str)``, the term tests
    ``isIRI/isURI/isBlank/isLiteral/isNumeric(?v)``, ``langMatches``,
    ``sameTerm`` (these need ``bgp_match(term_meta=True)``), the value
    functions ``str strlen ucase lcase concat substr replace strbefore
    strafter abs round ceil floor if coalesce lang datatype md5 sha1
    sha256 encode_for_uri``, variables, numeric/string/boolean
    literals, and grouping parens. Precedence: ``||`` < ``&&`` < ``!`` <
    comparison/IN < ``+ -`` < ``* /``.
    """
    toks = _tokenize_expr(expr)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else (None, None)

    def take(expect=None):
        nonlocal pos
        t = peek()
        if expect is not None and t != expect:
            raise ValueError(f"expected {expect} at token {pos} in {expr!r}, got {t}")
        pos += 1
        return t

    def or_expr():
        node = and_expr()
        while peek() == ("op", "||"):
            take()
            node = ("or", node, and_expr())
        return node

    def and_expr():
        node = unary()
        while peek() == ("op", "&&"):
            take()
            node = ("and", node, unary())
        return node

    def unary():
        if peek() == ("op", "!"):
            take()
            return ("not", unary())
        return relational()

    def relational():
        left = additive()
        kind, val = peek()
        if kind == "op" and val in ("=", "!=", "<", "<=", ">", ">="):
            take()
            return ("cmp", val, left, additive())
        if (kind, val) == ("fn", "in"):
            take()
            return ("in", left, in_list())
        if (kind, val) == ("fn", "not"):
            take()
            if peek() != ("fn", "in"):
                raise ValueError(f"expected IN after NOT in {expr!r}")
            take()
            return ("not", ("in", left, in_list()))
        return left

    def in_list():
        take(("op", "("))
        items = []
        if peek() != ("op", ")"):
            items.append(additive())
            while peek() == ("op", ","):
                take()
                items.append(additive())
        take(("op", ")"))
        return items

    def additive():
        node = multiplicative()
        while peek() in (("op", "+"), ("op", "-")):
            _, op = take()
            node = ("arith", op, node, multiplicative())
        return node

    def multiplicative():
        node = primary()
        while peek() in (("op", "*"), ("op", "/")):
            _, op = take()
            node = ("arith", op, node, primary())
        return node

    def primary():
        kind, val = take()
        if kind == "op" and val == "(":
            node = or_expr()
            take(("op", ")"))
            return node
        if kind == "var":
            return ("var", val)
        if kind in ("num", "str", "bool"):
            return (kind, val)
        if kind == "fn":
            take(("op", "("))
            args = []
            if peek() != ("op", ")"):
                args.append(or_expr())
                while peek() == ("op", ","):
                    take()
                    args.append(or_expr())
            take(("op", ")"))
            return ("call", val, args)
        raise ValueError(f"unexpected token {kind, val} in {expr!r}")

    node = or_expr()
    if pos != len(toks):
        raise ValueError(f"trailing tokens at {pos} in {expr!r}")
    return node


_BOOL_NODE_KINDS = ("or", "and", "not", "cmp", "in")
_BOOL_FNS = ("regex", "bound", "contains", "strstarts", "strends",
             "isiri", "isuri", "isblank", "isliteral", "isnumeric",
             "langmatches", "sameterm")
_VALUE_FNS = ("str", "strlen", "ucase", "lcase", "concat", "substr",
              "replace", "strbefore", "strafter", "abs", "round", "ceil",
              "floor", "if", "coalesce", "lang", "datatype",
              "md5", "sha1", "sha256", "encode_for_uri")

_RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
_XSD_NUMERIC = (
    "http://www.w3.org/2001/XMLSchema#integer",
    "http://www.w3.org/2001/XMLSchema#decimal",
    "http://www.w3.org/2001/XMLSchema#double",
    "http://www.w3.org/2001/XMLSchema#float",
    "http://www.w3.org/2001/XMLSchema#int",
    "http://www.w3.org/2001/XMLSchema#long",
    "http://www.w3.org/2001/XMLSchema#short",
    "http://www.w3.org/2001/XMLSchema#byte",
    "http://www.w3.org/2001/XMLSchema#nonNegativeInteger",
    "http://www.w3.org/2001/XMLSchema#positiveInteger",
    "http://www.w3.org/2001/XMLSchema#nonPositiveInteger",
    "http://www.w3.org/2001/XMLSchema#negativeInteger",
    "http://www.w3.org/2001/XMLSchema#unsignedInt",
    "http://www.w3.org/2001/XMLSchema#unsignedLong",
    "http://www.w3.org/2001/XMLSchema#unsignedShort",
    "http://www.w3.org/2001/XMLSchema#unsignedByte",
)


class _ExprCompiler:
    """Compile parse_filter ASTs to Columns over a solution table whose
    variable columns hold LEXICAL FORMS (strings). SPARQL numeric
    coercion: an arithmetic operand or a comparison against a numeric
    value casts the variable side to double via try_cast — a non-numeric
    lexical becomes NULL (a SPARQL type error; FILTER drops the row,
    which is exactly Spark's NULL-filter semantics, and BIND binds the
    error as unbound/NULL per §10.1). var-vs-var comparisons are lexical
    (string) comparisons. Everything compiles to built-in Column
    expressions — whole-stage codegen, never a UDF.
    """

    def __init__(self, columns: list[str]):
        self.columns = columns

    # -- value position -----------------------------------------------
    def value(self, n):
        """-> (column, tag) where tag in var/num/str/bool."""
        kind = n[0]
        if kind == "var":
            if n[1] not in self.columns:
                raise ValueError(
                    f"FILTER variable ?{n[1]} not bound (have {self.columns})"
                )
            return F.col(n[1]), "var"
        if kind == "num":
            v = n[1]
            return F.lit(int(v) if v == int(v) else v), "num"
        if kind == "str":
            return F.lit(n[1]), "str"
        if kind == "bool":
            return F.lit(n[1]), "bool"
        if kind == "arith":
            op, ln, rn = n[1], n[2], n[3]
            lc = self._numeric(ln)
            rc = self._numeric(rn)
            out = {"+": lc + rc, "-": lc - rc, "*": lc * rc, "/": lc / rc}[op]
            return out, "num"
        if kind == "call":
            return self._value_call(n[1], n[2])
        if kind in _BOOL_NODE_KINDS:
            # boolean expression used as a value (BIND(?x > 3 AS ?b))
            return self.boolean(n), "bool"
        raise ValueError(f"expected a value operand, got {n!r}")

    def _numeric(self, n):
        c, t = self.value(n)
        if t == "str":
            raise ValueError(f"string literal in arithmetic: {n!r}")
        return c.try_cast("double") if t == "var" else c

    def _string(self, n):
        c, t = self.value(n)
        return c.cast("string") if t in ("num", "bool") else c

    def _str_literal(self, n, what):
        if n[0] != "str":
            raise ValueError(f"{what} must be a string literal, got {n!r}")
        return n[1]

    def _meta(self, n, suffix, fn):
        """Resolve a variable's hidden term-metadata column (term_meta)."""
        if n[0] != "var":
            raise ValueError(f"{fn}() takes a variable, got {n!r}")
        col = f"{n[1]}{suffix}"
        if col not in self.columns:
            raise ValueError(
                f"{fn}(?{n[1]}) needs term metadata — match the pattern "
                "with bgp_match(term_meta=True)"
            )
        return F.col(col)

    def _value_call(self, fn, args):
        if fn == "lang":
            # §17.4.4.4: lang of a plain/typed literal is ""; of a
            # non-literal a type error (NULL — FILTER drops the row)
            (a,) = args
            kind = self._meta(a, "__kind", "lang")
            lang = self._meta(a, "__lang", "lang")
            return F.when(kind == "Literal", F.coalesce(lang, F.lit(""))), "str"
        if fn == "datatype":
            # §17.4.4.7: plain literal → xsd:string, lang-tagged →
            # rdf:langString, typed → its datatype; non-literal → error
            (a,) = args
            kind = self._meta(a, "__kind", "datatype")
            lang = self._meta(a, "__lang", "datatype")
            dt = self._meta(a, "__dt", "datatype")
            return F.when(kind == "Literal", F.coalesce(
                dt,
                F.when(lang.isNotNull(), F.lit(_RDF_LANGSTRING))
                 .otherwise(F.lit(_XSD_STRING)))), "str"
        if fn == "str":
            (a,) = args
            return self._string(a), "str"
        if fn in ("md5", "sha1", "sha256"):
            # §17.5 hash functions — lowercase hex, the IRI-minting
            # workhorses; all JVM builtins
            (a,) = args
            s = self._string(a)
            out = {"md5": F.md5(s), "sha1": F.sha1(s),
                   "sha256": F.sha2(s, 256)}[fn]
            return out, "str"
        if fn == "encode_for_uri":
            # §17.4.3.10: RFC 3986 percent-encoding keeping only the
            # unreserved set; Java's URLEncoder (F.url_encode) differs in
            # exactly three ways — space→'+', '*' kept, '~' encoded —
            # patched here so the result matches the SPARQL definition
            (a,) = args
            enc = F.url_encode(self._string(a))
            enc = F.replace(enc, F.lit("+"), F.lit("%20"))
            enc = F.replace(enc, F.lit("*"), F.lit("%2A"))
            enc = F.replace(enc, F.lit("%7E"), F.lit("~"))
            return enc, "str"
        if fn == "strlen":
            (a,) = args
            return F.length(self._string(a)), "num"
        if fn in ("ucase", "lcase"):
            (a,) = args
            f = F.upper if fn == "ucase" else F.lower
            return f(self._string(a)), "str"
        if fn == "concat":
            if not args:
                raise ValueError("concat() needs at least one argument")
            return F.concat(*[self._string(a) for a in args]), "str"
        if fn == "substr":
            if len(args) not in (2, 3):
                raise ValueError("substr(text, start[, len]) — 1-based, like §17.4.3.3")
            text = self._string(args[0])
            start = self._numeric(args[1]).cast("int")
            length = (
                self._numeric(args[2]).cast("int")
                if len(args) == 3
                else F.lit(2**31 - 1)
            )
            return text.substr(start, length), "str"
        if fn == "replace":
            if len(args) != 3:
                raise ValueError("replace(text, pattern, replacement)")
            pat = self._str_literal(args[1], "replace pattern")
            rep = self._str_literal(args[2], "replacement")
            return F.regexp_replace(self._string(args[0]), pat, rep), "str"
        if fn in ("strbefore", "strafter"):
            if len(args) != 2:
                raise ValueError(f"{fn}(text, string-literal)")
            text = self._string(args[0])
            s = self._str_literal(args[1], f"{fn} needle")
            pos = F.instr(text, s)
            if fn == "strbefore":
                # substring_index returns the WHOLE string when the needle
                # is absent; §17.4.3.4 wants "" — hence the instr guard
                hit = F.substring_index(text, s, 1)
            else:
                hit = text.substr(pos + F.lit(len(s)), F.lit(2**31 - 1))
            return F.when(pos > 0, hit).otherwise(F.lit("")), "str"
        if fn in ("abs", "round", "ceil", "floor"):
            (a,) = args
            f = {"abs": F.abs, "round": F.round, "ceil": F.ceil,
                 "floor": F.floor}[fn]
            return f(self._numeric(a)), "num"
        if fn == "if":
            if len(args) != 3:
                raise ValueError("if(condition, then, else)")
            cond = self.boolean(args[0])
            tc, tt = self.value(args[1])
            ec, et = self.value(args[2])
            # two explicit whens, not otherwise: a NULL condition (a SPARQL
            # type error) must yield error/NULL (§17.4.1.2), not the else arm
            out = F.when(cond, tc).when(~cond, ec)
            return out, (tt if tt != "var" else et)
        if fn == "coalesce":
            if not args:
                raise ValueError("coalesce() needs at least one argument")
            pairs = [self.value(a) for a in args]
            return F.coalesce(*[c for c, _ in pairs]), pairs[0][1]
        if fn in _BOOL_FNS:
            return self._bool_call(fn, args), "bool"
        raise ValueError(
            f"unsupported function {fn!r} in a value position "
            f"(have {sorted(_VALUE_FNS + _BOOL_FNS)})"
        )

    # -- boolean position ----------------------------------------------
    def _cmp(self, op, ln, rn):
        lc, lt = self.value(ln)
        rc, rt = self.value(rn)
        if "num" in (lt, rt):
            # try_cast: a non-numeric lexical becomes NULL (a SPARQL
            # type error — the row is dropped), instead of an ANSI raise
            lc = lc.try_cast("double") if lt == "var" else lc
            rc = rc.try_cast("double") if rt == "var" else rc
        elif "bool" in (lt, rt):
            lc = lc.try_cast("boolean") if lt == "var" else lc
            rc = rc.try_cast("boolean") if rt == "var" else rc
        return {
            "=": lc == rc,
            "!=": lc != rc,
            "<": lc < rc,
            "<=": lc <= rc,
            ">": lc > rc,
            ">=": lc >= rc,
        }[op]

    def boolean(self, n):
        kind = n[0]
        if kind == "or":
            return self.boolean(n[1]) | self.boolean(n[2])
        if kind == "and":
            return self.boolean(n[1]) & self.boolean(n[2])
        if kind == "not":
            return ~self.boolean(n[1])
        if kind == "cmp":
            return self._cmp(n[1], n[2], n[3])
        if kind == "in":
            left, items = n[1], n[2]
            if not items:
                return F.lit(False)  # §17.4.1.9: IN () is false
            pred = self._cmp("=", left, items[0])
            for item in items[1:]:
                pred = pred | self._cmp("=", left, item)
            return pred
        if kind == "call":
            fn, args = n[1], n[2]
            if fn in _BOOL_FNS:
                return self._bool_call(fn, args)
            raise ValueError(
                f"unsupported FILTER function {fn!r} "
                f"(boolean functions: {sorted(_BOOL_FNS)})"
            )
        raise ValueError(f"expression {n!r} is not boolean-valued")

    def _bool_call(self, fn, args):
        if fn == "bound":
            (v,) = args
            if v[0] != "var":
                raise ValueError("bound() takes a variable")
            if v[1] not in self.columns:
                raise ValueError(f"bound(?{v[1]}): variable not in scope")
            return F.col(v[1]).isNotNull()
        if fn == "regex":
            if len(args) not in (2, 3):
                raise ValueError("regex(text, pattern[, flags])")
            text = self._string(args[0])
            pat = self._str_literal(args[1], "regex pattern")
            if len(args) == 3:
                java_flags = "".join(
                    f for f in self._str_literal(args[2], "regex flags")
                    if f in "imsx"
                )
                if java_flags:
                    pat = f"(?{java_flags}){pat}"
            return text.rlike(pat)
        if fn in ("contains", "strstarts", "strends"):
            if len(args) != 2:
                raise ValueError(f"{fn}(text, string-literal)")
            text = self._string(args[0])
            s = self._str_literal(args[1], f"{fn} needle")
            return {
                "contains": text.contains(s),
                "strstarts": text.startswith(s),
                "strends": text.endswith(s),
            }[fn]
        if fn in ("isiri", "isuri", "isblank", "isliteral"):
            (a,) = args
            kind = self._meta(a, "__kind", fn)
            want = {"isiri": "URIRef", "isuri": "URIRef",
                    "isblank": "BNode", "isliteral": "Literal"}[fn]
            return kind == want
        if fn == "isnumeric":
            # §17.4.2.4: a literal with a numeric datatype and a valid
            # lexical form; plain/lang literals (NULL dt — coalesce to
            # false, or !isNumeric would NULL-drop them) and non-literals
            # are false
            (a,) = args
            kind = self._meta(a, "__kind", fn)
            dt = self._meta(a, "__dt", fn)
            val = self.value(a)[0]
            return ((kind == "Literal")
                    & F.coalesce(dt.isin(*_XSD_NUMERIC), F.lit(False))
                    & F.coalesce(val.try_cast("double").isNotNull(),
                                 F.lit(False)))
        if fn == "langmatches":
            # §17.4.4.5 / RFC 4647 basic filtering: "*" matches any
            # non-empty tag; otherwise the range equals the tag or is a
            # prefix of it at a '-' boundary, case-insensitively
            if len(args) != 2:
                raise ValueError('langmatches(lang(?v), "range")')
            tag = F.lower(self._string(args[0]))
            rng = self._str_literal(args[1], "langmatches range").lower()
            if rng == "*":
                return tag != ""
            return (tag == rng) | tag.startswith(rng + "-")
        if fn == "sameterm":
            # §17.4.1.8: RDF term identity — lexical form AND kind AND
            # lang AND datatype (null-safe on the optional components)
            if len(args) != 2 or args[0][0] != "var" or args[1][0] != "var":
                raise ValueError("sameterm(?a, ?b) takes two variables")
            a, b = args
            pred = self.value(a)[0] == self.value(b)[0]
            for suf in ("__kind", "__lang", "__dt"):
                pred = pred & self._meta(a, suf, "sameterm").eqNullSafe(
                    self._meta(b, suf, "sameterm"))
            return pred
        raise ValueError(f"unknown boolean function {fn!r}")


def _compile_filter(node, columns: list[str]):
    """Compile a parse_filter AST to a boolean Column (see _ExprCompiler)."""
    return _ExprCompiler(columns).boolean(node)


def compile_value_expr(expr: str, columns: list[str]):
    """Compile a SPARQL value expression (the §17.4 subset parse_filter
    accepts) to a Column over a solution table — the engine behind BIND
    and SELECT expressions. Arithmetic yields double, string functions
    string, comparisons boolean; plain variables keep their lexical
    form."""
    node = parse_filter(expr)
    col, _ = _ExprCompiler(columns).value(node)
    return col


def bgp_extend(solutions: DataFrame, assignments) -> DataFrame:
    """SPARQL ``BIND`` — the algebra's Extend(§18.4) — over a solution
    table: each ``(var, expression)`` adds a new column computed from the
    bindings in scope (arithmetic, string/numeric builtins, IF/COALESCE —
    see :func:`parse_filter`). Re-binding an in-scope variable raises,
    per the grammar's BIND restriction (§10.1). ``assignments`` is a
    dict or a list of pairs; entries apply in order, so later BINDs can
    reference earlier ones.

    Scale shape: compiles to Project expressions inside whole-stage
    codegen — no UDF, no shuffle, pipelined into whatever stage already
    produces the solutions.
    """
    items = assignments.items() if isinstance(assignments, dict) else assignments
    out = solutions
    for var, expr in items:
        var = var.lstrip("?")
        if var in out.columns:
            raise ValueError(
                f"BIND would re-bind ?{var}, already in scope {out.columns}"
            )
        out = out.withColumn(var, compile_value_expr(expr, out.columns))
    return out


def bgp_filter(solutions: DataFrame, expr: str) -> DataFrame:
    """SPARQL ``FILTER`` over a solution table (§17.2–§17.4 subset — see
    :func:`parse_filter`): comparisons with numeric coercion, ``&& || !``,
    ``IN / NOT IN``, arithmetic ``+ - * /``, ``regex()``, ``bound()``,
    ``contains/strstarts/strends`` and the value builtins (strlen, ucase,
    substr, if, coalesce, ...). Error rows (e.g. a non-numeric lexical
    compared numerically) are dropped, per the spec's effective-boolean-
    value rule.

    Scale shape: compiles to ONE whole-stage-codegen Filter over the
    solution columns — no UDF, no shuffle; when applied directly after a
    single-pattern BGP, Catalyst pushes the predicate into the statements
    scan.
    """
    return solutions.filter(_compile_filter(parse_filter(expr), solutions.columns))


def order_solutions(
    solutions: DataFrame,
    keys: list,
    limit: int | None = None,
    offset: int = 0,
    numeric: tuple = (),
) -> DataFrame:
    """SPARQL ``ORDER BY`` / ``LIMIT`` / ``OFFSET`` solution modifiers
    (§15). ``keys`` entries are ``"?v"`` (ascending), ``"desc(?v)"`` /
    ``"asc(?v)"``, or ``(var, "desc")`` tuples; variables named in
    ``numeric`` sort by double value (SPARQL numeric order), others by
    lexical form. Unbound (NULL) sorts lowest, per the spec's ordering of
    unbound before bound. The full column list is appended ascending as a
    deterministic tie-break so equal-key rows have a stable order.

    Scale shape: with a LIMIT, Spark plans TakeOrderedAndProject — a
    per-partition top-(limit+offset) heap plus a single-reduce merge, no
    global sort materialization; without one it is a range-partitioned
    global sort (sampled boundaries), the honest cost of a total order.
    """
    import re as _re

    cols = solutions.columns
    parsed: list[tuple[str, bool]] = []
    for k in keys:
        if isinstance(k, tuple):
            var, direction = k
            var = var.lstrip("?")
            asc = str(direction).lower() != "desc"
        else:
            m = _re.fullmatch(r"(?:(asc|desc)\()?\s*\?(\w+)\s*\)?", k.strip(),
                              _re.IGNORECASE)
            if not m:
                raise ValueError(f"bad ORDER BY key {k!r}")
            asc = (m.group(1) or "asc").lower() == "asc"
            var = m.group(2)
        if var not in cols:
            raise ValueError(f"ORDER BY variable ?{var} not bound (have {cols})")
        parsed.append((var, asc))

    order = []
    keyed = set()
    for var, asc in parsed:
        c = F.col(var).try_cast("double") if var in numeric else F.col(var)
        order.append(c.asc_nulls_first() if asc else c.desc_nulls_last())
        keyed.add(var)
    order.extend(F.col(c).asc_nulls_first() for c in cols if c not in keyed)

    out = solutions.orderBy(*order)
    if offset:
        out = out.offset(offset)
    return out.limit(limit) if limit is not None else out
