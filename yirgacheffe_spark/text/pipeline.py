"""The end-to-end training-data curation pipeline as one composable call.

``curate_corpus`` chains the engine's curation operators in the order the
public pipelines (CCNet, Gopher, RefinedWeb) established — each stage is
optional and individually tested elsewhere; this module owns only the
composition and the per-stage accounting:

    URL canonical dedup + domain blocklist (optional)  ->  exact dedup
    ->  boilerplate line removal  ->  heuristic quality floor
    ->  Gopher rules (optional)  ->  LM quality floor (optional)
    ->  classifier quality filter (optional)  ->  MinHash cluster dedup
    ->  eval-set decontamination (optional)
    ->  stratified language sampling (optional)
    ->  DSIR importance selection (optional)
    ->  token-budget cap (optional)

Most stages are lazy DataFrame transforms, but ``with_report=False`` does
NOT make the whole call lazy: stages whose PLAN depends on the data run
bounded Spark jobs at composition time — boilerplate removal counts its
hot-line set to pick broadcast vs shuffle (one aggregate over the corpus),
and a token-budget cap runs the banded prefix-sum trim.  Expect the call
itself to take corpus-scan time when those stages are enabled; pass
``boilerplate_min_docs=None`` / ``token_budget=None`` (or pre-compute
outside) if construction must return instantly.  The returned report adds
ONE count per enabled stage on top — at 10^12 rows, skip it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup, quality, sampling


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    url_col: str | None = None,
    url_blocklist: DataFrame | None = None,
    boilerplate_min_docs: int | None = 3,
    min_quality: float | None = 0.1,
    gopher_rules: bool = False,
    lm_model: DataFrame | None = None,
    lm_min_avg_logprob: float = -12.0,
    eval_docs: DataFrame | None = None,
    decontam_ngram: int = 13,
    near_dup_threshold: float | None = 0.8,
    minhash_num_perm: int = 64,
    minhash_bands: int = 16,
    lang_fractions: "dict | None" = None,
    lang_col: str = "lang",
    sample_seed: int = 0,
    classifier_model=None,
    classifier_threshold: float = 0.5,
    dsir_target_model: DataFrame | None = None,
    dsir_raw_model: DataFrame | None = None,
    dsir_k: int | None = None,
    dsir_buckets: int = 10_000,
    token_budget: int | None = None,
    tokens_col: str | None = None,
    with_report: bool = True,
) -> "tuple[DataFrame, list[tuple[str, int]] | None]":
    """Returns ``(curated, report)`` — ``report`` is a list of
    ``(stage_name, rows_after)`` pairs (None when ``with_report=False``).

    Pass ``None`` for any stage's knob to skip that stage.  ``lm_model``
    is a (gram, count) table from ``lm.train_ngram_counts`` on a
    reference corpus.  ``url_col`` enables canonical-URL dedup (and, with
    ``url_blocklist`` — a one-column ``domain`` table — domain blocking)
    before any text is read; ``eval_docs`` enables n-gram eval-set
    decontamination after near-dup removal.

    ``classifier_model`` (a fitted ``classifier.train_quality_classifier``
    PipelineModel) enables model-based quality filtering after the LM
    floor.  ``dsir_target_model`` + ``dsir_raw_model`` + ``dsir_k``
    (tables from ``lm.train_hashed_ngram_model``) enable DSIR importance
    selection as the final selection stage.  ``token_budget`` +
    ``tokens_col`` cap the output at ~``token_budget`` total tokens
    (deterministic hash-prefix rule, ``sampling.sample_token_budget``).
    """
    stages: list[tuple[str, int]] = []
    cur = docs
    pinned: list = []

    def record(name: str) -> None:
        # Persist each counted stage so the report costs k stage executions
        # total, not ~k^2/2 (each count would otherwise re-run every prior
        # unpersisted stage from the source), and so the returned frame
        # resumes from the last stage rather than replaying the pipeline.
        nonlocal cur
        if with_report:
            cur = cur.persist()
            pinned.append(cur)
            stages.append((name, cur.count()))

    record("input")

    if url_col is not None:
        from . import urls as urls_mod  # pylint: disable=C0415

        if url_blocklist is not None:
            cur = urls_mod.domain_filter(
                cur, url_blocklist, url_col, mode="block", id_col=id_col
            )
            record("url_domain_block")
        cur = urls_mod.dedup_by_canonical_url(cur, url_col, id_col)
        record("url_canonical_dedup")

    cur = dedup.exact_dedup(cur, text_col, id_col)
    record("exact_dedup")

    if boilerplate_min_docs is not None:
        cur = dedup.remove_boilerplate_lines(
            cur, boilerplate_min_docs, text_col, id_col
        )
        record("boilerplate_removal")

    if min_quality is not None:
        cur = cur.where(
            quality.quality_score(F.col(text_col)) >= F.lit(min_quality)
        )
        record("quality_floor")

    if gopher_rules:
        from . import gopher as gopher_mod  # pylint: disable=C0415

        cur = gopher_mod.gopher_filter(cur, text_col)
        record("gopher_rules")

    if lm_model is not None:
        from . import lm as lm_mod  # pylint: disable=C0415

        cur = lm_mod.quality_filter_by_lm(
            cur, lm_model, text_col=text_col, id_col=id_col,
            min_avg_logprob=lm_min_avg_logprob,
        )
        record("lm_filter")

    if classifier_model is not None:
        from . import classifier as clf_mod  # pylint: disable=C0415

        cur = clf_mod.quality_classifier_filter(
            cur, classifier_model, threshold=classifier_threshold
        )
        record("classifier_filter")

    if near_dup_threshold is not None:
        pairs = dedup.minhash_dedup_pairs(
            cur, text_col, id_col, num_perm=minhash_num_perm,
            bands=minhash_bands, threshold=near_dup_threshold,
        )
        cur = dedup.dedup_keep_cluster_representative(cur, pairs, id_col)
        record("near_dup_cluster_dedup")

    if eval_docs is not None:
        cur = dedup.decontaminate(
            cur, eval_docs, text_col, id_col, n=decontam_ngram
        )
        record("decontamination")

    if lang_fractions is not None:
        cur = sampling.stratified_sample(
            cur, lang_col, lang_fractions, id_col, seed=sample_seed
        )
        record("language_sampling")

    if dsir_k is not None:
        if dsir_target_model is None or dsir_raw_model is None:
            raise ValueError(
                "dsir_k needs dsir_target_model and dsir_raw_model "
                "(lm.train_hashed_ngram_model tables)"
            )
        from . import lm as lm_mod  # pylint: disable=C0415

        cur = lm_mod.dsir_select(
            cur, dsir_target_model, dsir_raw_model, k=dsir_k,
            buckets=dsir_buckets, text_col=text_col, id_col=id_col,
            seed=sample_seed,
        )
        record("dsir_selection")

    if token_budget is not None:
        if tokens_col is None:
            raise ValueError("token_budget needs tokens_col (a per-document "
                             "token-count column)")
        cur = sampling.sample_token_budget(
            cur, token_budget, tokens_col=tokens_col, key_col=id_col,
            seed=sample_seed,
        )
        record("token_budget_cap")

    for handle in pinned[:-1]:  # keep only the final stage cached
        handle.unpersist()
    return cur, (stages if with_report else None)
