"""Solr local-params query parsing: ``{!type key=val ...}body``.

Reference semantics (paths relative to ``/root/reference/``):

- Local-params grammar — ``solr/core/src/java/org/apache/solr/search/
  QueryParsing.java:66-150`` (``parseLocalParams``): after ``{!``,
  whitespace-separated entries; a bare identifier sets the parser
  ``type``; ``key=value`` pairs accept bare, single- or double-quoted
  values with backslash escapes; a value starting with ``$`` dereferences
  a request parameter; ``v=`` overrides the body after ``}``.
- Parser dispatch — ``solr/core/.../search/QParserPlugin.java`` standard
  registry. Implemented types and their reference plugins:

  ============ ==========================================================
  ``lucene``   LuceneQParserPlugin (default) — classic syntax via
               :func:`..search.query.parse_query`; ``df`` sets the
               default field
  ``term``     TermQParserPlugin.java — single term on field ``f``,
               readable value used verbatim (no analysis chain)
  ``raw``      RawQParserPlugin.java:35-43 — exact term, zero analysis
  ``field``    FieldQParserPlugin.java — body analyzed with the index
               analyzer; one token → TermQuery, several → PhraseQuery
  ``prefix``   PrefixQParserPlugin.java — PrefixQuery on field ``f``
  ``bool``     BoolQParserPlugin.java:42-45 — sub-queries from repeated
               ``must`` / ``must_not`` / ``filter`` / ``should`` params
               (each recursively parsed), ``mm`` = minimum-should-match
  ``switch``   SwitchQParserPlugin.java — trimmed body selects local
               param ``case.<body>`` (or ``case`` when blank); fallback
               ``default``; no match → error
  ``query``    NestedQParserPlugin.java — re-parse the (usually
               ``$ref``-ed) body, ``defType`` sets its default parser
  ``frange``   FunctionRangeQParserPlugin — see
               :class:`..search.query.FunctionRangeQuery`
  ``maxscore`` MaxScoreQParser — see :func:`..search.query.parse_maxscore`
  ``terms``    TermsQParserPlugin.java — TermInSetQuery over the
               ``separator``-split body (method param is an execution
               hint only)
  ``boost``    BoostQParserPlugin.java — multiplicative function boost
               ``b`` over the body query
  ``dismax`` / ``edismax``  DisMaxQParser / ExtendedDismaxQParser — body
               via :func:`.edismax.edismax_query` with qf/mm/pf/tie/ps/
               bf/bq/boost local params; mm defaults off ``q.op``
               (AND → 100%, OR → 0%; DisMaxQParser.parseMinShouldMatch)
  ``simple``   SimpleQParserPlugin — SimpleQueryParser syntax
  ``surround`` SurroundQParserPlugin — span-operator syntax
  ``xmlparser`` CoreParser XML query DSL via :mod:`.xmlparser`
  ============ ==========================================================
"""

from __future__ import annotations

from .query import (
    CONTENT_FIELD,
    BooleanQuery,
    FunctionRangeQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    parse_maxscore,
    parse_query,
)


class QParserError(ValueError):
    pass


def parse_local_params(
    q: str, params: dict | None = None
) -> tuple[str | None, dict, str]:
    """Split ``{!type k=v ...}body`` → (type, local-params, body).

    Repeated keys accumulate into lists (BoolQParserPlugin reads repeated
    ``must``/``should`` params). ``$name`` values dereference ``params``.
    A ``v`` local param replaces the body. Returns ``(None, {}, q)`` when
    ``q`` carries no local-params prefix.
    """
    params = params or {}
    if not q.startswith("{!"):
        return None, {}, q
    i, n = 2, len(q)
    qtype: str | None = None
    local: dict = {}

    def deref(val: str) -> str:
        if val.startswith("$"):
            name = val[1:]
            if name not in params:
                raise QParserError(f"missing request parameter ${name}")
            return params[name]
        return val

    while i < n and q[i] != "}":
        while i < n and q[i].isspace():
            i += 1
        if i >= n or q[i] == "}":
            break
        j = i
        while j < n and q[j] not in "=} \t\r\n":
            j += 1
        key = q[i:j]
        if j < n and q[j] == "=":
            j += 1
            if j < n and q[j] in "'\"":
                quote, j = q[j], j + 1
                buf = []
                while j < n and q[j] != quote:
                    if q[j] == "\\" and j + 1 < n:
                        j += 1
                    buf.append(q[j])
                    j += 1
                if j >= n:
                    raise QParserError(f"unterminated quote in {q!r}")
                j += 1  # closing quote
                val = "".join(buf)
            else:
                k0 = j
                while j < n and q[j] not in "} \t\r\n":
                    j += 1
                val = q[k0:j]
            val = deref(val)
            if key in local:
                prev = local[key]
                local[key] = (prev if isinstance(prev, list) else [prev]) + [val]
            else:
                local[key] = val
        elif key:
            if qtype is None:
                qtype = key
            else:
                raise QParserError(f"unexpected bare token {key!r} in {q!r}")
        i = j
    if i >= n or q[i] != "}":
        raise QParserError(f"missing '}}' in local params: {q!r}")
    body = q[i + 1:]
    if "v" in local:
        body = local["v"]
    return qtype or "lucene", local, body


def _as_list(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def parse_solr_q(
    q: str,
    params: dict | None = None,
    analyzer=None,
    default_type: str = "lucene",
) -> Query:
    """Parse a Solr ``q``/``fq`` string (with optional local params) into a
    :class:`Query`. ``params`` holds request parameters for ``$ref``
    dereferencing."""
    qtype, local, body = parse_local_params(q, params)
    if qtype is None:
        qtype = default_type
    field = local.get("f", CONTENT_FIELD)

    if qtype == "lucene":
        return parse_query(
            body, analyzer, default_field=local.get("df", CONTENT_FIELD)
        )
    if qtype in ("term", "raw"):
        # readable value verbatim; RawQParserPlugin additionally skips the
        # readableToIndexed conversion — identical here (no schema types)
        return TermQuery(body.strip(), field=field)
    if qtype == "field":
        from ..analysis.tokenizer import StandardAnalyzer, analyze_with_positions

        toks = analyze_with_positions(body, analyzer or StandardAnalyzer())
        if not toks:
            return BooleanQuery()  # matches nothing
        if len(toks) == 1:
            return TermQuery(toks[0][0], field=field)
        base = toks[0][1]
        return PhraseQuery(
            terms=tuple(t for t, _ in toks),
            rel_positions=tuple(p - base for _, p in toks),
            field=field,
        )
    if qtype == "prefix":
        return PrefixQuery(body.strip(), field=field)
    if qtype == "bool":
        def sub(vals):
            return [parse_solr_q(v, params, analyzer) for v in _as_list(vals)]

        bq = BooleanQuery(
            must=sub(local.get("must")),
            should=sub(local.get("should")),
            must_not=sub(local.get("must_not")),
            filter=sub(local.get("filter")),
        )
        if "mm" in local:
            bq.min_should_match = int(local["mm"])
        return bq
    if qtype == "switch":
        key = body.strip()
        lookup = f"case.{key}" if key else "case"
        if lookup in local:
            return parse_solr_q(local[lookup], params, analyzer)
        if "default" in local:
            return parse_solr_q(local["default"], params, analyzer)
        raise QParserError(f"no switch case matched {key!r}")
    if qtype == "query":
        return parse_solr_q(
            body, params, analyzer,
            default_type=local.get("defType", "lucene"),
        )
    if qtype == "frange":
        def num(k):
            return float(local[k]) if k in local else None

        return FunctionRangeQuery(
            expr=body.strip(),
            lower=num("l"),
            upper=num("u"),
            include_lower=local.get("incl", "true") == "true",
            include_upper=local.get("incu", "true") == "true",
        )
    if qtype == "maxscore":
        return parse_maxscore(body, tie=float(local.get("tie", 0.0)),
                              analyzer=analyzer)
    if qtype == "terms":
        # TermsQParserPlugin (solr/core/.../search/TermsQParserPlugin.java):
        # separator default ","; method (termsFilter etc.) is an execution
        # hint, identical results here
        from .query import TermInSetQuery

        sep = local.get("separator", ",")
        terms = tuple(sorted({t.strip() for t in body.split(sep) if t.strip()}))
        return TermInSetQuery(terms=terms, field=field)
    if qtype == "boost":
        # BoostQParserPlugin: multiplicative function boost b over the body
        # query (BoostedQuery / FunctionScoreQuery.boostByValue)
        from .query import BoostedQuery

        if "b" not in local:
            raise QParserError("{!boost} requires a b function")
        inner = parse_solr_q(body, params, analyzer,
                             default_type=local.get("defType", "lucene"))
        return BoostedQuery(inner, local["b"])
    if qtype in ("dismax", "edismax"):
        # (Extended)DismaxQParser: qf/mm/pf/tie/ps/bf/bq/boost options.
        # Solr wraps local params over request params
        # (SolrParams.wrapDefaults in QParser.getParam), so e.g.
        # q={!dismax} with qf supplied as a request param still applies.
        from .edismax import edismax_query

        req = params or {}

        def opt(k, default=None):
            return local.get(k, req.get(k, default))

        def fmap(spec):
            out = {}
            for part in spec.split():
                f, _, b = part.partition("^")
                out[f] = float(b) if b else 1.0
            return out

        # DisMaxQParser.parseMinShouldMatch: mm defaults off q.op —
        # AND → "100%", OR (the default) → "0%"
        qop = str(opt("q.op", "OR")).upper()
        mm = opt("mm", "100%" if qop == "AND" else "0%")
        bq_spec = opt("bq")
        bq = (parse_solr_q(bq_spec, params, analyzer)
              if bq_spec is not None else None)
        pf_spec = opt("pf")
        return edismax_query(
            body,
            qf=fmap(opt("qf", CONTENT_FIELD)),
            mm=mm,
            pf=fmap(pf_spec) if pf_spec is not None else None,
            tie=float(opt("tie", 0.0)),
            ps=int(opt("ps", 0)),
            analyzer=analyzer,
            bf=opt("bf"),
            boost=opt("boost"),
            bq=bq,
        )
    if qtype == "simple":
        from .simpleparser import parse_simple

        # q.op falls back to request params (SolrParams.wrapDefaults)
        qop = str(local.get("q.op", (params or {}).get("q.op", "OR"))).upper()
        op = "MUST" if qop == "AND" else "SHOULD"
        return parse_simple(body, analyzer, default_operator=op)
    if qtype == "surround":
        from .surround import parse_surround

        return parse_surround(body, analyzer)
    if qtype == "xmlparser":
        from .xmlparser import parse_xml_query

        return parse_xml_query(body, analyzer,
                               default_field=local.get("df", CONTENT_FIELD))
    raise QParserError(f"unknown query parser type {qtype!r}")
