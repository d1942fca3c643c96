"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (full index build + BM25 search over
the sf0.001 documents corpus). ``queries()`` exposes every implemented
operator/pipeline from SURVEY.md §2 as ``sf_dir -> table`` callables;
``oracle_sql()`` gives the DuckDB-equivalent SQL the driver compares against
(row-count + schema + order-insensitive value hash).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from lucene_solr_ray.pipelines import ann, dedup, events, facets, fulltext, multimodal, percolate, solr_facets, spatial, streaming_exprs, text
from lucene_solr_ray.pipelines import fulltext_sql as fs


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001's documents corpus and
    run the reference query set (terms + booleans) through the BM25 engine."""
    sf_dir = "/root/testdata/sf0.001"
    import pyarrow as pa

    terms = fulltext.ft_topk_terms(sf_dir)
    bools = fulltext.ft_topk_bool(sf_dir)
    return pa.concat_tables(
        [terms.select(["query_id", "rank", "doc_id"]), bools.select(["query_id", "rank", "doc_id"])]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # --- fulltext engine (SURVEY.md §2: analysis, norms, stats, postings,
        #     BM25 scoring, boolean ops, WAND) ---
        "ft_collection_stats": fulltext.ft_collection_stats,
        "ft_schema_info": fulltext.ft_schema_info,
        "ft_df_histogram": fulltext.ft_df_histogram,
        "ft_doc_norms": fulltext.ft_doc_norms,
        "ft_term_stats": fulltext.ft_term_stats,
        "ft_topk_terms": fulltext.ft_topk_terms,
        "ft_topk_bool": fulltext.ft_topk_bool,
        "ft_phrase": fulltext.ft_phrase,
        "ft_phrase_sloppy": fulltext.ft_phrase_sloppy,
        "ft_prefix": fulltext.ft_prefix,
        "ft_facets": fulltext.ft_facets,
        "ft_facet_hierarchy": fulltext.ft_facet_hierarchy,
        "ft_facet_sampled": fulltext.ft_facet_sampled,
        "ft_facet_range": fulltext.ft_facet_range,
        "ft_sorted_by_path": fulltext.ft_sorted_by_path,
        "ft_index_sorted": fulltext.ft_index_sorted,
        "ft_rescore": fulltext.ft_rescore,
        "ft_field_stats": fulltext.ft_field_stats,
        "ft_drill_sideways": fulltext.ft_drill_sideways,
        "ft_join_scored": fulltext.ft_join_scored,
        "ft_dismax": fulltext.ft_dismax,
        "ft_filter_query": fulltext.ft_filter_query,
        "ft_terms_enum": fulltext.ft_terms_enum,
        "ft_phrase_prefix": fulltext.ft_phrase_prefix,
        "ft_pivot_facets": fulltext.ft_pivot_facets,
        "ft_classify_nb": fulltext.ft_classify_nb,
        "ft_elevate": fulltext.ft_elevate,
        "ft_realtime_get": fulltext.ft_realtime_get,
        "ft_facet_query": fulltext.ft_facet_query,
        "ft_export": fulltext.ft_export,
        "ft_collapse": fulltext.ft_collapse,
        "ft_deep_page": fulltext.ft_deep_page,
        "ft_blended": fulltext.ft_blended,
        "ft_ltr_linear": fulltext.ft_ltr_linear,
        "ft_ltr_trees": fulltext.ft_ltr_trees,
        "ft_expr_sort": fulltext.ft_expr_sort,
        "ft_cluster_results": fulltext.ft_cluster_results,  # rows-only: k-means pinned in pytest
        "ft_explain": fulltext.ft_explain,
        "ft_multi_sort": fulltext.ft_multi_sort,
        "ft_multi_term": fulltext.ft_multi_term,
        "ft_lm_logprob": fulltext.ft_lm_logprob,
        "ft_multi_phrase": fulltext.ft_multi_phrase,
        "ft_multi_phrase_sloppy": fulltext.ft_multi_phrase_sloppy,
        "ft_nested_bool": fulltext.ft_nested_bool,
        "ft_synonym_query": fulltext.ft_synonym_query,
        "ft_term_set": fulltext.ft_term_set,
        "ft_constant_score": fulltext.ft_constant_score,
        "ft_span_first_or": fulltext.ft_span_first_or,
        "ft_search_fl": fulltext.ft_search_fl,
        "ft_spell_collate": fulltext.ft_spell_collate,
        "ft_mmr_rerank": fulltext.ft_mmr_rerank,  # rows-only: greedy MMR pinned in pytest
        "ft_model_rerank": fulltext.ft_model_rerank,
        "ft_check_index": fulltext.ft_check_index,
        "ft_classify_knn": fulltext.ft_classify_knn,  # rows-only: vote pinned in pytest
        "ft_wand_topk": fulltext.ft_wand_topk,  # oracle: same SQL as the 'or' disjunctions
        "ft_field_search": fulltext.ft_field_search,
        "ft_numeric_range": fulltext.ft_numeric_range,
        "ft_highlight": fulltext.ft_highlight,  # rows-only: snippets pinned in pytest
        "ft_topk_classic": fulltext.ft_topk_classic,
        "ft_topk_lmdirichlet": fulltext.ft_topk_lmdirichlet,
        "ft_topk_sweetspot": fulltext.ft_topk_sweetspot,
        "ft_topk_axiomatic": fulltext.ft_topk_axiomatic,
        "ft_common_terms": fulltext.ft_common_terms,
        "ft_function_boost": fulltext.ft_function_boost,
        "ft_feature_field": fulltext.ft_feature_field,
        "ft_frange": fulltext.ft_frange,
        "ft_fingerprint_filter": fulltext.ft_fingerprint_filter,
        "ft_field_exists": fulltext.ft_field_exists,
        "ft_topk_dfr": fulltext.ft_topk_dfr,
        "ft_topk_ib": fulltext.ft_topk_ib,
        "ft_topk_jm": fulltext.ft_topk_jm,
        "ft_shingle": fulltext.ft_shingle,
        "ft_word_delimiter": fulltext.ft_word_delimiter,
        "ft_html_strip": fulltext.ft_html_strip,
        "ft_covering": fulltext.ft_covering,
        "ft_ngram": fulltext.ft_ngram,
        "ft_length_filter": fulltext.ft_length_filter,
        "ft_common_grams": fulltext.ft_common_grams,
        "ft_keepword": fulltext.ft_keepword,
        "ft_docvalues_set": fulltext.ft_docvalues_set,
        "ft_func_termfreq": fulltext.ft_func_termfreq,
        "ft_wordbreak": fulltext.ft_wordbreak,
        "ft_reverse_wildcard": fulltext.ft_reverse_wildcard,
        "ft_graph_synonym": fulltext.ft_graph_synonym,
        "ft_keywords": fulltext.ft_keywords,
        "ft_diversified": fulltext.ft_diversified,
        "ft_strdist": fulltext.ft_strdist,
        "ft_suggest_fuzzy": fulltext.ft_suggest_fuzzy,
        "ft_edge_ngram": fulltext.ft_edge_ngram,
        "ft_synonym": fulltext.ft_synonym,
        "ft_english": fulltext.ft_english,  # rows-only: Porter not SQL-expressible
        "ft_mlt": fulltext.ft_mlt,
        "ft_suggest_prefix": fulltext.ft_suggest_prefix,
        "ft_suggest_infix": fulltext.ft_suggest_infix,
        "ft_spellcheck": fulltext.ft_spellcheck,
        "ft_join": fulltext.ft_join,
        "ft_span_near": fulltext.ft_span_near,
        "ft_intervals": fulltext.ft_intervals,
        "ft_parser": fulltext.ft_parser,
        "ft_payload": fulltext.ft_payload,
        "ft_payload_check": fulltext.ft_payload_check,
        "ft_edismax": fulltext.ft_edismax,
        "ft_edismax_boost": fulltext.ft_edismax_boost,
        "ft_multifield": fulltext.ft_multifield,
        "ft_surround": fulltext.ft_surround,
        "ft_simple_parser": fulltext.ft_simple_parser,
        "ft_func_scale": fulltext.ft_func_scale,
        "ft_complex_phrase": fulltext.ft_complex_phrase,
        "ft_span_multiterm": fulltext.ft_span_multiterm,
        "ft_span_contain": fulltext.ft_span_contain,
        "ft_span_posrange": fulltext.ft_span_posrange,
        "ft_facets_prefix": fulltext.ft_facets_prefix,
        "ft_facet_interval": fulltext.ft_facet_interval,
        "ft_grouped_search": fulltext.ft_grouped_search,
        "ft_termvectors": fulltext.ft_termvectors,
        "ft_block_join": fulltext.ft_block_join,
        "ft_block_join_children": fulltext.ft_block_join_children,
        # --- text analysis ---
        "token_count": text.token_count,
        "lang_id": text.lang_id,
        "quality": text.quality,
        "fingerprint": text.fingerprint,
        "scrub": text.scrub,
        "split_assign": text.split_assign,
        "pack_greedy": text.pack_greedy,
        "bigram_stats": text.bigram_stats,
        "decontaminate": text.decontaminate,
        "gopher_quality": text.gopher_quality,
        "freetext_suggest": text.freetext_suggest,
        "sample_mix": text.sample_mix,
        "chunk_windows": text.chunk_windows,
        "bpe_token_count": text.bpe_token_count,  # rows-only: iterative BPE pinned in pytest
        "ft_tag": text.ft_tag,
        # --- dedup family ---
        "dedup_exact": dedup.dedup_exact,
        "dedup_shingle_set": dedup.dedup_shingle_set,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash": dedup.simhash,
        "embed_dup_pairs": dedup.embed_dup_pairs,
        "dedup_clusters": dedup.dedup_clusters,
        "dedup_substring": dedup.dedup_substring,
        # --- similarity search ---
        "ann_topk": ann.ann_topk,
        "emb_quantize": ann.emb_quantize,
        "ann_lsh_topk": ann.ann_lsh_topk,  # approximate: rows-only check; recall pinned in pytest
        "ann_ivf_topk": ann.ann_ivf_topk,  # approximate (IVF): rows-only; recall + scan bound in pytest
        # --- events / windows ---
        "events_hourly": events.events_hourly,
        "events_hopping": events.events_hopping,
        "events_sessionize": events.events_sessionize,
        "events_type_stats": events.events_type_stats,
        "events_cumulative": events.events_cumulative,
        "events_top_users": events.events_top_users,
        "events_props_stats": events.events_props_stats,
        "events_funnel": events.events_funnel,
        "events_date_math": events.events_date_math,
        "events_facet_range": events.events_facet_range,
        # --- facets / grouping / stats ---
        "facet_counts": facets.facet_counts,
        "grouped_topk": facets.grouped_topk,
        "lang_char_stats": facets.lang_char_stats,
        "solr_json_facets": solr_facets.solr_json_facets,
        "solr_json_nested": solr_facets.solr_json_nested,
        "percentile_tdigest": solr_facets.percentile_tdigest,  # rows-only: t-digest sketch pinned in pytest
        # --- Solr streaming expressions (parser + stream algebra on Ray Data) ---
        "st_rollup": streaming_exprs.st_rollup,
        "st_join_topk": streaming_exprs.st_join_topk,
        "st_unique_having": streaming_exprs.st_unique_having,
        "st_facet": streaming_exprs.st_facet,
        "st_complement": streaming_exprs.st_complement,
        "st_fetch_rollup": streaming_exprs.st_fetch_rollup,
        "st_region_rollup": streaming_exprs.st_region_rollup,
        "st_timeseries": streaming_exprs.st_timeseries,
        "st_random": streaming_exprs.st_random,
        "st_knn": streaming_exprs.st_knn,
        "st_significant": streaming_exprs.st_significant,
        "st_update": streaming_exprs.st_update,
        "st_cartesian": streaming_exprs.st_cartesian,
        "st_nodes": streaming_exprs.st_nodes,
        "st_score_nodes": streaming_exprs.st_score_nodes,
        "graph_shortest_path": streaming_exprs.graph_shortest_path,
        # --- multimodal plumbing ---
        "mm_payload_features": multimodal.mm_payload_features,
        "mm_frame_sample": multimodal.mm_frame_sample,
        "mm_resize": multimodal.mm_resize,
        # --- percolator (MemoryIndex reverse search) ---
        "percolate": percolate.percolate,
        # --- spatial (LatLonPoint / geodist analogs over derived points) ---
        "geo_box": spatial.geo_box,
        "geo_distance_topk": spatial.geo_distance_topk,
        "geo_polygon": spatial.geo_polygon,
        "geo_heatmap": spatial.geo_heatmap,
    }


def oracle_sql() -> dict[str, str]:
    term_specs = [
        {"qid": t, "kind": "term", "terms": [t], "k": fulltext.TOPK_K, "with_score": True}
        for t in fulltext.TERM_QUERIES
    ]
    return {
        "ft_collection_stats": fs.sql_collection_stats(),
        "ft_schema_info": fs.sql_schema_info(),
        "ft_df_histogram": fs.sql_df_histogram(fulltext.DF_BUCKET),
        "ft_doc_norms": fs.sql_doc_norms(),
        "ft_term_stats": fs.sql_term_stats(),
        "ft_topk_terms": fs.sql_topk_union(term_specs),
        "ft_topk_bool": fs.sql_topk_union(fulltext.BOOL_SPECS),
        # WAND is rank-identical to the exhaustive disjunctions — same SQL
        # oracle as ft_topk_bool's 'or' subset (rank + doc_id, no score col)
        "ft_wand_topk": fs.sql_topk_union(
            [s for s in fulltext.BOOL_SPECS if s["kind"] == "or"]
        ),
        "ft_field_search": fs.sql_field_search(fulltext.FIELD_SPECS),
        "ft_numeric_range": fs.sql_numeric_range(fulltext.NUMERIC_SPECS),
        "ft_topk_classic": fs.sql_topk_classic(fulltext.SIM_TERMS, fulltext.TOPK_K),
        "ft_topk_lmdirichlet": fs.sql_topk_lmdirichlet(fulltext.SIM_TERMS, fulltext.TOPK_K, 2000.0),
        "ft_topk_sweetspot": fs.sql_topk_sweetspot(fulltext.SIM_TERMS, fulltext.SWEET_PARAMS, fulltext.TOPK_K),
        "ft_topk_axiomatic": fs.sql_topk_axiomatic(fulltext.SIM_TERMS, fulltext.TOPK_K),
        "ft_common_terms": fs.sql_common_terms(fulltext.CTQ_SPECS),
        "ft_function_boost": fs.sql_function_boost(fulltext.SIM_TERMS, fulltext.TOPK_K),
        "ft_feature_field": fs.sql_feature_field(
            fulltext.FEATURE_TERMS, fulltext.FEATURE_PIVOT, "merge", fulltext.TOPK_K),
        "ft_field_exists": fs.sql_field_exists(),
        "ft_frange": fs.sql_frange(fulltext.FRANGE_EXPR, fulltext.FRANGE_SPECS, fulltext.TOPK_K),
        "ft_fingerprint_filter": fs.sql_fingerprint_filter(fulltext.FINGERPRINT_MAX),
        "ft_topk_dfr": fs.sql_topk_dfr(fulltext.SIM_TERMS, fulltext.TOPK_K),
        "ft_topk_ib": fs.sql_topk_ib(fulltext.SIM_TERMS, fulltext.TOPK_K),
        "ft_topk_jm": fs.sql_topk_jm(fulltext.SIM_TERMS, fulltext.TOPK_K, fulltext.JM_LAMBDA),
        "ft_shingle": fs.sql_topk_variant(fs.prelude_shingle(2, 2), fulltext.SHINGLE_SPECS),
        "ft_word_delimiter": fs.sql_topk_variant(fs.prelude_word_delimiter(), fulltext.WD_SPECS),
        "ft_html_strip": fs.sql_topk_variant(fs.prelude_html_strip(), fulltext.HTML_SPECS),
        "ft_covering": fs.sql_covering(fulltext.COVERING_TERMS, fulltext.COVERING_MODS),
        "ft_ngram": fs.sql_topk_variant(fs.prelude_ngram(*fulltext.NGRAM_RANGE), fulltext.NGRAM_SPECS),
        "ft_length_filter": fs.sql_topk_variant(fs.prelude_length_filter(*fulltext.LENGTH_RANGE), fulltext.LENGTH_SPECS),
        "ft_common_grams": fs.sql_topk_variant(fs.prelude_common_grams(), fulltext.COMMON_GRAMS_SPECS),
        "ft_keepword": fs.sql_topk_variant(fs.prelude_keep_words(fulltext.KEEP_WORDS), fulltext.KEEP_SPECS),
        "ft_docvalues_set": fs.sql_docvalues_set(fulltext.DV_TERM, fulltext.DV_LANGS, fulltext.DV_LENS, fulltext.TOPK_K),
        "ft_func_termfreq": fs.sql_func_termfreq(
            fulltext.FUNC_T1, fulltext.FUNC_T2, fulltext.LTR_RERANK_K, fulltext.TOPK_K,
            "f.score + 0.5 * ln(1.0 + coalesce(t.tf, 0))"),
        "ft_wordbreak": fs.sql_wordbreak(fulltext.WB_INPUTS, 5),
        "ft_reverse_wildcard": fs.sql_reverse_wildcard(fulltext.REVWILD_SUFFIXES),
        "ft_graph_synonym": fs.sql_graph_synonym(fulltext.GRAPH_SYN_SPECS),
        "ft_keywords": fs.sql_keywords(fulltext.KW_DOC_IDS, fulltext.KW_TOP),
        "ft_diversified": fs.sql_diversified(fulltext.DIVERS_TERM, fulltext.DIVERS_MAX_PER_KEY, fulltext.TOPK_K),
        "ft_strdist": fs.sql_strdist(fulltext.STRDIST_TARGET, fulltext.TOPK_K),
        "ft_suggest_fuzzy": fs.sql_suggest_fuzzy(fulltext.FUZZY_SUGGEST_QS, 10),
        "ft_edge_ngram": fs.sql_topk_variant(
            fs.prelude_edge_ngram(*fulltext.EDGE_NGRAM_RANGE), fulltext.EDGE_SPECS
        ),
        "ft_synonym": fs.sql_topk_variant(
            fs.prelude_synonyms(fulltext.SYNONYM_PAIRS), fulltext.SYNONYM_SPECS
        ),
        "ft_mlt": fs.sql_mlt(fulltext.MLT_SRC_DOCS, fulltext.TOPK_K),
        "ft_suggest_prefix": fs.sql_suggest_prefix(fulltext.SUGGEST_PREFIXES),
        "ft_suggest_infix": fs.sql_suggest_infix(fulltext.INFIX_SUBSTRINGS),
        "ft_spellcheck": fs.sql_spellcheck(fulltext.SPELL_INPUTS),
        "ft_join": fs.sql_join(fulltext.JOIN_SPECS),
        "ft_span_near": fs.sql_span_near(fulltext.SPAN_SPECS),
        "ft_surround": fs.sql_surround(),
        "ft_simple_parser": fs.sql_simple_parser(),
        "ft_intervals": fs.sql_intervals(fulltext.INTERVAL_SPECS),
        "ft_parser": fs.sql_parser(fulltext.PARSER_SPECS),
        "ft_payload": fs.sql_payload(fulltext.TOPK_K),
        "ft_payload_check": fs.sql_payload_check(fulltext.TOPK_K),
        "ft_edismax": fs.sql_edismax(
            fulltext.EDISMAX_SPECS, fulltext.EDISMAX_QF["lang"], fulltext.TOPK_K
        ),
        "ft_edismax_boost": fs.sql_edismax(
            fulltext.EDISMAX_BOOST_SPECS, fulltext.EDISMAX_QF["lang"], fulltext.TOPK_K
        ),
        "ft_func_scale": fs.sql_func_scale(
            fulltext.SCALE_TERM, fulltext.SCALE_LO, fulltext.SCALE_HI, fulltext.TOPK_K
        ),
        "ft_multifield": fs.sql_edismax(
            fulltext.MULTIFIELD_SPECS, fulltext.MULTIFIELD_BOOSTS["lang"], fulltext.TOPK_K
        ),
        "ft_complex_phrase": fs.sql_complex_phrase(fulltext.COMPLEX_PHRASE_SPECS),
        "ft_span_multiterm": fs.sql_span_multiterm(fulltext.SPAN_MULTITERM_SPECS),
        "ft_span_contain": fs.sql_span_contain(fulltext.SPAN_CONTAIN_SPECS),
        "ft_span_posrange": fs.sql_span_posrange(fulltext.SPAN_POSRANGE_SPECS),
        "ft_facets_prefix": fs.sql_facets_prefix(fulltext.FACET_TERM, fulltext.FACET_PREFIX),
        "ft_facet_interval": fs.sql_facet_interval(fulltext.FACET_TERM, fulltext.FACET_INTERVALS),
        "ft_grouped_search": fs.sql_grouped_search(
            fulltext.FACET_TERM, fulltext.GROUPED_N, fulltext.GROUPED_K
        ),
        "ft_termvectors": fs.sql_termvectors(fulltext.TV_DOC_IDS),
        "ft_block_join": fs.sql_block_join(fulltext.BJ_TERMS, fulltext.BJ_MODES, fulltext.TOPK_K),
        "ft_block_join_children": fs.sql_block_join_children(fulltext.BJC_SOURCES),
        "ft_phrase": fs.sql_phrase_union(fulltext.PHRASE_SPECS),
        "ft_phrase_sloppy": fs.sql_phrase_sloppy_union(fulltext.SLOPPY_SPECS),
        "ft_prefix": fs.sql_prefix_union(fulltext.PREFIX_SPECS),
        "ft_facets": fs.sql_facets(fulltext.FACET_TERM, "source"),
        "ft_facet_hierarchy": fs.sql_facet_hierarchy(fulltext.FACET_TERM, "source", "lang"),
        "ft_facet_sampled": fs.sql_facet_sampled(fulltext.FACET_TERM, "source", 40),
        "ft_facet_range": fs.sql_facet_range(fulltext.FACET_TERM, *fulltext.FACET_RANGE),
        "ft_sorted_by_path": fs.sql_sorted_by_field(fulltext.SORT_TERM, "path", 10),
        "ft_index_sorted": fs.sql_index_sorted(fulltext.SORT_TERM, 10),
        "ft_rescore": fs.sql_rescore(fulltext.RESCORE_FIRST, fulltext.RESCORE_SECOND,
                                     fulltext.RESCORE_FIRST_K, fulltext.TOPK_K,
                                     fulltext.RESCORE_WEIGHT),
        "ft_field_stats": fs.sql_field_stats(fulltext.STATS_TERM),
        "ft_join_scored": fs.sql_join_scored(fulltext.JOIN_SCORED_SPECS),
        "ft_dismax": fs.sql_dismax(fulltext.DISMAX_SPECS),
        "ft_filter_query": fs.sql_filter_query(fulltext.TOPK_K),
        "ft_terms_enum": fs.sql_terms_enum(fulltext.TERMS_ENUM_PREFIXES),
        "ft_phrase_prefix": fs.sql_phrase_prefix(fulltext.PHRASE_PREFIX_SPECS),
        "ft_pivot_facets": fs.sql_pivot_facets(fulltext.FACET_TERM),
        "ft_classify_nb": fs.sql_classify_nb(fulltext.NB_SAMPLE),
        "ft_elevate": fs.sql_elevate(fulltext.ELEVATE_TERM, fulltext.ELEVATE_IDS, fulltext.TOPK_K),
        "ft_realtime_get": fs.sql_realtime_get(fulltext.RTG_IDS),
        "ft_export": fs.sql_export(fulltext.EXPORT_TERM),
        "ft_collapse": fs.sql_collapse(fulltext.FACET_TERM, fulltext.COLLAPSE_K, fulltext.EXPAND_ROWS),
        "ft_deep_page": fs.sql_deep_page(fulltext.PAGE_TERM, fulltext.PAGE_SIZE, fulltext.N_PAGES),
        "ft_blended": fs.sql_blended(fulltext.BLENDED_SPECS, fulltext.TOPK_K),
        "ft_ltr_linear": fs.sql_ltr_linear(fulltext.LTR_TERM, fulltext.LTR_RERANK_K,
                                           fulltext.TOPK_K, fulltext.LTR_WEIGHTS,
                                           fulltext.LTR_VALUE_FEATURE),
        "ft_ltr_trees": fs.sql_ltr_trees(fulltext.LTR_TERM, fulltext.LTR_RERANK_K,
                                         fulltext.TOPK_K, fulltext.LTR_TREES_SPEC),
        "ft_expr_sort": fs.sql_expr_sort(fulltext.LTR_TERM, fulltext.LTR_RERANK_K,
                                         fulltext.TOPK_K, fulltext.EXPR_SORT),
        "ft_explain": fs.sql_explain(fulltext.EXPLAIN_TERM, fulltext.EXPLAIN_TOP),
        "ft_multi_sort": fs.sql_multi_sort(fulltext.MULTI_SORT_TERM, fulltext.TOPK_K),
        "ft_multi_term": fs.sql_multi_term(fulltext.MULTI_TERM_SPECS),
        "ft_lm_logprob": fs.sql_lm_logprob(),
        "ft_multi_phrase": fs.sql_multi_phrase(fulltext.MULTI_PHRASE_SPECS),
        "ft_multi_phrase_sloppy": fs.sql_multi_phrase_sloppy(fulltext.MULTI_PHRASE_SLOPPY_SPECS),
        "ft_nested_bool": fs.sql_nested_bool(),
        "ft_synonym_query": fs.sql_synonym_query(fulltext.SYNONYM_QUERY_TERMS, fulltext.TOPK_K),
        "ft_term_set": fs.sql_term_set(fulltext.TERM_SET),
        "ft_constant_score": fs.sql_constant_score("w", fulltext.CONST_BOOST),
        "ft_span_first_or": fs.sql_span_first_or(["spark", "vector"], fulltext.SPANFIRST_N),
        "ft_search_fl": fs.sql_search_fl(fulltext.FACET_TERM, fulltext.TOPK_K),
        "ft_spell_collate": fs.sql_spell_collate(fulltext.SPELL_COLLATE_QUERY),
        "ft_model_rerank": fs.sql_model_rerank(fulltext.LTR_TERM, fulltext.LTR_RERANK_K, fulltext.TOPK_K),
        "ft_check_index": fs.sql_check_index(),
        "ft_facet_query": fs.sql_facet_query([
            ("merge_and_join", "and", ["join", "merge"], None),
            ("window_or_vector", "or", ["vector", "window"], None),
            ("spark_not_merge", "and_not", ["spark"], ["merge"]),
            ("customer", "or", ["customer"], None),
        ]),
        "ft_drill_sideways": fs.sql_drill_sideways(
            fulltext.FACET_TERM, fulltext.DRILL_DIMS["repo"], fulltext.DRILL_DIMS["lang"]
        ),
        "token_count": text.SQL_TOKEN_COUNT,
        "lang_id": text.SQL_LANG_ID,
        "quality": text.SQL_QUALITY,
        "fingerprint": text.SQL_FINGERPRINT,
        "scrub": text.SQL_SCRUB,
        "split_assign": text.SQL_SPLIT_ASSIGN,
        "pack_greedy": text.SQL_PACK_GREEDY,
        "bigram_stats": text.SQL_BIGRAM_STATS,
        "decontaminate": text.SQL_DECONTAMINATE,
        "gopher_quality": text.SQL_GOPHER_QUALITY,
        "freetext_suggest": text.SQL_FREETEXT_SUGGEST,
        "sample_mix": text.SQL_SAMPLE_MIX,
        "chunk_windows": text.SQL_CHUNK_WINDOWS,
        "ft_tag": text.SQL_FT_TAG,
        "dedup_exact": dedup.SQL_DEDUP_EXACT,
        "dedup_shingle_set": dedup.SQL_DEDUP_SHINGLE_SET,
        "minhash_lsh_pairs": dedup.SQL_MINHASH_LSH_PAIRS,
        "simhash": dedup.SQL_SIMHASH,
        "embed_dup_pairs": dedup.SQL_EMBED_DUP_PAIRS,
        "dedup_clusters": dedup.SQL_DEDUP_CLUSTERS,
        "dedup_substring": dedup.SQL_DEDUP_SUBSTRING,
        "ann_topk": ann.SQL_ANN_TOPK,
        "emb_quantize": ann.SQL_EMB_QUANTIZE,
        "events_hourly": events.SQL_EVENTS_HOURLY,
        "events_hopping": events.SQL_EVENTS_HOPPING,
        "events_sessionize": events.SQL_EVENTS_SESSIONIZE,
        "events_type_stats": events.SQL_EVENTS_TYPE_STATS,
        "events_cumulative": events.SQL_EVENTS_CUMULATIVE,
        "events_top_users": events.SQL_EVENTS_TOP_USERS,
        "events_props_stats": events.SQL_EVENTS_PROPS_STATS,
        "events_funnel": events.SQL_EVENTS_FUNNEL,
        "events_date_math": events.SQL_EVENTS_DATE_MATH,
        "events_facet_range": events.SQL_EVENTS_FACET_RANGE,
        "facet_counts": facets.SQL_FACET_COUNTS,
        "grouped_topk": facets.SQL_GROUPED_TOPK,
        "lang_char_stats": facets.SQL_LANG_CHAR_STATS,
        "solr_json_facets": solr_facets.SQL_SOLR_JSON_FACETS,
        "solr_json_nested": solr_facets.SQL_SOLR_JSON_NESTED,
        "st_rollup": streaming_exprs.SQL_ST_ROLLUP,
        "st_join_topk": streaming_exprs.SQL_ST_JOIN_TOPK,
        "st_unique_having": streaming_exprs.SQL_ST_UNIQUE_HAVING,
        "st_facet": streaming_exprs.SQL_ST_FACET,
        "st_complement": streaming_exprs.SQL_ST_COMPLEMENT,
        "st_fetch_rollup": streaming_exprs.SQL_ST_FETCH_ROLLUP,
        "st_region_rollup": streaming_exprs.SQL_ST_REGION_ROLLUP,
        "st_timeseries": streaming_exprs.SQL_ST_TIMESERIES,
        "st_random": streaming_exprs.SQL_ST_RANDOM,
        "st_knn": fs.sql_mlt([streaming_exprs.ST_KNN_ID], 10),
        "st_significant": streaming_exprs.sql_st_significant(),
        "st_update": streaming_exprs.SQL_ST_UPDATE,
        "st_cartesian": streaming_exprs.SQL_ST_CARTESIAN,
        "st_nodes": streaming_exprs.SQL_ST_NODES,
        "st_score_nodes": streaming_exprs.SQL_ST_SCORE_NODES,
        "graph_shortest_path": streaming_exprs.SQL_GRAPH_SHORTEST_PATH,
        "mm_payload_features": multimodal.SQL_MM_PAYLOAD_FEATURES,
        "mm_frame_sample": multimodal.SQL_MM_FRAME_SAMPLE,
        "mm_resize": multimodal.SQL_MM_RESIZE,
        "percolate": percolate.SQL_PERCOLATE,
        "geo_box": spatial.SQL_GEO_BOX,
        "geo_distance_topk": spatial.SQL_GEO_DISTANCE_TOPK,
        "geo_polygon": spatial.SQL_GEO_POLYGON,
        "geo_heatmap": spatial.SQL_GEO_HEATMAP,
    }
