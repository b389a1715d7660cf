"""Composable corpus-curation facade.

A library surface over the registry's verified curation primitives —
the `Corpus` equivalent of the GraphFrames-style `Graph` facade
(operators/graph_api.py): users compose the standard training-data
pipeline as chained methods instead of assembling the DataFrame
plumbing by hand::

    from minispark_spark.corpus import Corpus

    clean = (
        Corpus(docs)                       # (doc_id, text, ...) frame
        .filter_quality(0.5)               # heuristic quality floor
        .filter_repetition()               # Gopher-style repetition gate
        .dedup_exact()                     # exact content dedup
        .dedup_fuzzy()                     # MinHash+LSH near-dup removal
        .decontaminate(eval_docs)          # eval 8-gram overlap drop
        .temperature_sample()              # inverse-sqrt source balancing
    )
    clean.stats().show()                   # per-source survivor report
    chunks = clean.chunks(chunk=64, stride=48)   # training windows

Every method is a THIN veneer over an oracle-verified implementation
(plans/quality.py, plans/text.py, operators/dedup.py,
plans/pipeline.py) — this module adds composition, not semantics; the
equivalences are pinned in tests/test_corpus.py. All transformations
stay lazy DataFrames: a composed pipeline is ONE Catalyst plan, so
filters still push down across stages and nothing materializes until
the caller acts.

No reference analogue (the reference has no text pipeline at all —
SURVEY.md §2.4); this is the build brief's training-data surface made
into an API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minispark_spark.functions import hashing, text


class Corpus:
    """A lazy view over a documents DataFrame with at least
    ``doc_id`` (unique long) and ``text`` (string) columns; extra
    columns (``source``, ``lang``, ...) pass through untouched."""

    def __init__(self, df: DataFrame):
        self.df = df

    def _with(self, df: DataFrame) -> "Corpus":
        return Corpus(df)

    # -- scoring ------------------------------------------------------------

    def scored(self) -> DataFrame:
        """Docs + token count + heuristic quality score (plans/text.py
        semantics; narrow projection, no shuffle)."""
        return self.df.withColumns(
            {
                "n_tokens": text.token_count(F.col("text")),
                "quality": text.quality_score(F.col("text")),
            }
        )

    def repetition_metrics(self) -> DataFrame:
        """Row-local Gopher-style repetition metrics — the streaming-
        capable path (streaming/quality.py), so the same call works on
        a readStream frame."""
        from minispark_spark.streaming.quality import repetition_metrics_rowlocal

        return repetition_metrics_rowlocal(self.df.select("doc_id", "text"))

    def gopher_metrics(self) -> DataFrame:
        """Docs + the eight Gopher rule metrics and keep flag
        (docs_gopher_quality semantics; row-local, zero shuffles)."""
        from minispark_spark.plans.quality import with_gopher_metrics

        return with_gopher_metrics(self.df)

    # -- filtering ----------------------------------------------------------

    def filter_gopher(self) -> "Corpus":
        """Keep docs passing the full Gopher rule set (Rae et al. 2021
        §A1.1 — docs_gopher_quality's keep flag). The keep column is a
        row-local expression over the doc's own text, so this is a plain
        narrow filter: no join, no shuffle, pushes to the scan."""
        from minispark_spark.plans.quality import GOPHER_METRIC_COLS

        return self._with(
            self.gopher_metrics().filter(F.col("keep")).drop(*GOPHER_METRIC_COLS)
        )

    def filter_quality(self, min_quality: float) -> "Corpus":
        """Keep docs with quality_score >= ``min_quality`` (the
        docs_corpus_curation gate). Narrow predicate — pushes down."""
        return self._with(
            self.df.filter(text.quality_score(F.col("text")) >= min_quality)
        )

    def filter_repetition(self) -> "Corpus":
        """Drop repetitive docs (docs_repetition_filter keep flag via
        the row-local metrics — one narrow Python pass, no shuffle)."""
        keep = self.repetition_metrics().filter(F.col("keep")).select("doc_id")
        return self._with(self.df.join(keep, "doc_id", "left_semi"))

    # -- dedup --------------------------------------------------------------

    def dedup_exact(self) -> "Corpus":
        """Exact content dedup: keep the min doc_id per text
        fingerprint (docs_corpus_curation's dedup stage). One shuffle
        on the 8-byte hash, never on the text."""
        fp = self.df.withColumn("__fp", hashing.poly_hash(F.col("text")))
        keep = fp.groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
        return self._with(fp.join(keep, ["__fp", "doc_id"]).drop("__fp"))

    def winnow_pairs(self) -> DataFrame:
        """(doc_a, doc_b, shared) — document pairs sharing winnowing
        fingerprints (docs_winnow_match core): DETERMINISTIC
        substring-overlap candidates via the MOSS guarantee, the exact
        complement of the probabilistic MinHash pairs. Hot boilerplate
        fingerprints are capped (operators/winnow.py)."""
        from minispark_spark.operators.winnow import winnow_match_pairs

        return winnow_match_pairs(self.df.select("doc_id", "text"))

    def fuzzy_pairs(self) -> DataFrame:
        """(doc_a, doc_b, jaccard) MinHash+LSH verified near-dup pairs
        (dedup_minhash_lsh core: bucketed candidates, broadcast
        verification — never all-pairs)."""
        from minispark_spark.operators.dedup import (
            minhash_verified_pairs,
            shingled_docs,
        )

        return minhash_verified_pairs(
            shingled_docs(self.df.select("doc_id", "text")).cache()
        )

    def exact_fuzzy_pairs(self) -> DataFrame:
        """(doc_a, doc_b, jaccard) EXACT near-dup pairs via prefix
        filtering (dedup_jaccard_prefix_filter core) — the
        no-approximation alternative to fuzzy_pairs, same >= 0.8
        output contract as the quadratic oracle."""
        from minispark_spark.operators.dedup import (
            prefix_filter_pairs,
            shingled_docs,
        )

        return prefix_filter_pairs(
            shingled_docs(self.df.select("doc_id", "text")).cache()
        )

    def dedup_fuzzy(self) -> "Corpus":
        """Near-dup removal: LSH pairs -> connected components -> keep
        the min doc_id per cluster (docs_fuzzy_dedup_curation path)."""
        from minispark_spark.operators.graph_api import connected_components_labels

        pairs_df = self.fuzzy_pairs().select("doc_a", "doc_b")
        sym = pairs_df.select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        ).unionByName(
            pairs_df.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
        )
        dead = (
            connected_components_labels(sym)
            .filter(F.col("label") != F.col("node"))
            .select(F.col("node").alias("doc_id"))
        )
        return self._with(self.df.join(dead, "doc_id", "left_anti"))

    def dedup_lines(self) -> "Corpus":
        """C4-style destructive line dedup (docs_c4_line_dedup core):
        every repeated sentence keeps only its FIRST occurrence corpus-
        wide (min (doc_id, idx), a skew-safe min-struct groupBy, no
        window) and each doc's text is re-assembled in original order.
        Docs whose every sentence was scrubbed are dropped. Columns
        derived from the original text (e.g. ``n_chars``) are NOT
        recomputed (scrub_spans convention)."""
        sent = (
            self.df.select(
                "doc_id",
                F.posexplode(F.split(F.col("text"), r"[.!?]+")).alias("idx", "s"),
            )
            .select("doc_id", "idx", F.trim("s").alias("sentence"))
            .filter(F.col("sentence") != "")
        )
        firsts = sent.groupBy("sentence").agg(
            F.min(F.struct("doc_id", "idx")).alias("f")
        )
        cleaned = (
            sent.join(firsts, "sentence")
            .filter(
                (F.col("doc_id") == F.col("f.doc_id"))
                & (F.col("idx") == F.col("f.idx"))
            )
            .groupBy("doc_id")
            .agg(
                F.concat_ws(
                    ". ",
                    F.expr(
                        "transform(array_sort(collect_list(struct(idx, sentence))),"
                        " x -> x.sentence)"
                    ),
                ).alias("__clean")
            )
        )
        return self._with(
            self.df.drop("text")
            .join(cleaned, "doc_id")
            .withColumnRenamed("__clean", "text")
        )

    def split_leakage_safe(self) -> DataFrame:
        """``(doc_id, split)`` — 96/2/2 train/val/test assignment keyed
        on the near-dup CLUSTER id (docs_leakage_safe_split core), so a
        test doc can never have a near-copy in train. Singleton docs
        hash their own id."""
        from minispark_spark.operators.graph_api import connected_components_labels

        pairs_df = self.fuzzy_pairs().select("doc_a", "doc_b")
        sym = pairs_df.select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        ).unionByName(
            pairs_df.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
        )
        labels = connected_components_labels(sym).select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
        )
        c = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
        bucket = hashing.poly_hash(c.cast("string")) % 100
        split = (
            F.when(bucket < 96, F.lit("train"))
            .when(bucket < 98, F.lit("val"))
            .otherwise("test")
        )
        return (
            self.df.select("doc_id")
            .join(labels, "doc_id", "left")
            .select("doc_id", split.alias("split"))
        )

    def decontaminate(self, eval_docs: DataFrame, n: int = 8) -> "Corpus":
        """Drop docs sharing any word-``n``-gram with ``eval_docs``
        (docs_decontaminate shape: the eval shingle set is small and
        broadcasts; the corpus side is probed map-side)."""
        from minispark_spark.plans.text import _doc_shingles

        spark = self.df.sparkSession
        ev = (
            _doc_shingles(spark, eval_docs.select("doc_id", "text"), n=n)
            .select("sh")
            .distinct()
        )
        contaminated = (
            _doc_shingles(spark, self.df.select("doc_id", "text"), n=n)
            .join(F.broadcast(ev), "sh")
            .select("doc_id")
            .distinct()
        )
        return self._with(self.df.join(contaminated, "doc_id", "left_anti"))

    def dedup_semantic(
        self,
        embeddings: DataFrame,
        k: int = 8,
        n_iters: int = 2,
        threshold: float = 0.35,
    ) -> "Corpus":
        """SemDeDup (semantic_dedup core): k-means-bucketed cosine
        near-dup removal over a (doc_id, embedding array<float>)
        frame; each semantic group keeps its lowest doc_id."""
        from minispark_spark.operators.semdedup import semantic_dup_flags

        emb = embeddings.select(F.col("doc_id").alias("vec_id"), "embedding")
        dead = (
            semantic_dup_flags(self.df.sparkSession, emb, k, n_iters, threshold)
            .filter(~F.col("keep"))
            .select(F.col("vec_id").alias("doc_id"))
        )
        return self._with(self.df.join(dead, "doc_id", "left_anti"))

    def scrub_spans(self) -> "Corpus":
        """Replace ``text`` with its duplicated-8-gram-scrubbed version
        (docs_span_scrub core). Pass-through columns derived from the
        original text (e.g. ``n_chars``) are NOT recomputed."""
        from minispark_spark.plans.quality import span_scrub_frame

        scrubbed = span_scrub_frame(self.df.select("doc_id", "text")).select(
            "doc_id", F.col("clean_text").alias("text")
        )
        return self._with(self.df.drop("text").join(scrubbed, "doc_id"))

    # -- sampling -----------------------------------------------------------

    def select_dsir(self, target) -> "Corpus":
        """Keep the top quarter by DSIR-shaped importance score
        (docs_dsir_select core); ``target`` is the boolean Column
        defining the target distribution, e.g. ``F.col('lang') ==
        'en'``."""
        from minispark_spark.plans.quality import dsir_select_frame

        keep = dsir_select_frame(self.df, target).filter("keep").select("doc_id")
        return self._with(self.df.join(keep, "doc_id"))

    def token_budget(self, budget: int) -> "Corpus":
        """Greedy per-source token-budget fill in deterministic hash
        order (docs_token_budget_mixture core)."""
        from minispark_spark.plans.quality import token_budget_frame

        keep = token_budget_frame(self.df, budget).filter("keep").select("doc_id")
        return self._with(self.df.join(keep, "doc_id"))

    def temperature_sample(self, c: float = 300.0, mod: int = 1_000_000) -> "Corpus":
        """Inverse-sqrt source balancing (docs_temperature_mixture
        math): keep each doc with probability min(1, c/sqrt(source
        tokens)), decided by a deterministic per-doc hash draw."""
        toks = self.df.withColumns(
            {
                "__n_tok": text.token_count(F.col("text")).cast("long"),
                "__draw": hashing.poly_hash(F.col("doc_id").cast("string")) % mod,
            }
        )
        rated = (
            toks.groupBy("source")
            .agg(F.sum("__n_tok").alias("__src_tokens"))
            .select(
                "source",
                F.least(
                    F.lit(1.0),
                    F.lit(c) / F.sqrt(F.col("__src_tokens").cast("double")),
                ).alias("__rate"),
            )
        )
        picked = F.col("__draw").cast("double") < F.col("__rate") * F.lit(float(mod))
        return self._with(
            toks.join(F.broadcast(rated), "source")
            .filter(picked)
            .drop("__n_tok", "__draw", "__rate")
        )

    # -- outputs ------------------------------------------------------------

    def chunks(self, chunk: int = 64, stride: int = 48) -> DataFrame:
        """Overlapping training windows (docs_chunk_overlap core) —
        zero-shuffle narrow generate."""
        from minispark_spark.plans.quality import chunk_overlap

        return chunk_overlap(self.df.select("doc_id", "text"), chunk, stride)

    def stats(self) -> DataFrame:
        """Per-source survivor report: doc count, total tokens, average
        quality (decimal-exact mean, docs_corpus_curation semantics)."""
        return self.scored().groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            (
                F.sum(F.col("quality").cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_quality"),
        )

    def pack(self, budget: int = 256) -> DataFrame:
        """Continuous sequence packing into ``budget``-token training
        packs (docs_sequence_packing core): per-pack doc count and
        token totals, computed with distributed ranking — no global
        sort."""
        from minispark_spark.plans.text import pack_sequences

        return pack_sequences(self.df.select("doc_id", "text"), budget)

    def report(self) -> DataFrame:
        """One-row corpus datasheet (corpus_report core): totals, exact
        duplicate rate, language/source cardinalities, dominant
        language, token-length extremes."""
        from minispark_spark.plans.quality import corpus_report_frame

        return corpus_report_frame(self.df)

    def readability(self) -> DataFrame:
        """Docs + Flesch reading ease / FK grade (docs_readability
        semantics — regex-exact counts, row-local, zero shuffles)."""
        from minispark_spark.plans.text import with_readability

        return with_readability(self.df.select("doc_id", "text"))

    def classify_nb(self) -> DataFrame:
        """Held-out predictions of the multinomial NB label classifier
        trained on the corpus's own hash split (docs_nb_classify
        semantics: integer-quantized Laplace weights, prior fallback
        for all-unknown-token docs)."""
        from minispark_spark.plans.classify import nb_predictions

        return nb_predictions(self.df)

    def select_features_chi2(self, k: int = 50) -> DataFrame:
        """Top-k label-discriminative tokens by chi-square over the
        document-level presence contingency (docs_token_chi2_topk
        semantics)."""
        from minispark_spark.plans.classify import token_chi2_topk

        return token_chi2_topk(self.df, k)
