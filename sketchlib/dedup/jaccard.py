"""Exact n-gram Jaccard near-duplicate pairs via prefix filtering.

Unlike MinHash+LSH (``sketchlib.dedup.minhash``), which trades a small
recall loss for a fixed-size signature, this operator returns EVERY pair
with word-shingle Jaccard >= threshold — no approximation — while still
never materializing the all-pairs cross product.  It is the distributed
All-Pairs / SSJoin prefix-filtering algorithm (Bayardo, Ma & Srikant,
WWW'07; Chaudhuri, Ganti & Kaushik, ICDE'06; PPJoin, Xiao et al. WWW'08):

1. **shingles** — the same JVM-built distinct word k-grams as MinHash
   (``minhash.shingles_col``), so both operators agree on the gram domain.
2. **canonical order** — grams are globally ordered by (document
   frequency, gram hash), ascending: the rarest grams come first.  DF is
   computed with one groupBy over the exploded (gram, doc) pairs.
3. **prefix filtering** — for a doc with |S| grams, only the first
   ``p = |S| - ceil(t * |S|) + 1`` grams in canonical order index the doc.
   Prefix-filtering principle: if ``|A ∩ B| >= a`` then the
   ``(|A|-a+1)``-prefix of A and the ``(|B|-a+1)``-prefix of B share at
   least one element under any common total order.  ``J(A,B) >= t``
   implies ``|A ∩ B| >= ceil(t * max(|A|,|B|))``, so these prefixes are a
   lossless candidate index: every qualifying pair shares a prefix gram.
4. **candidates** — self-join of the prefix index on the gram key, with the
   length filter ``t * |B| <= |A| <= |B| / t`` (J(A,B) <= min/max sizes).
   Because prefixes are rare-gram-first, bucket sizes stay small even when
   stopword grams are corpus-frequent — the shuffle key distribution is
   governed by the *tail* of the gram DF histogram, not its head.
5. **verify** — exact Jaccard over the real shingle string arrays
   (``array_intersect``/``array_union``), recomputed only for candidate
   ids via a broadcast semi-join (same shape as ``minhash.near_dup_pairs``).

Grams are compared via ``xxhash64`` in steps 2-4: a 64-bit collision can
only *add* a candidate pair (recall is unaffected; precision is restored
by the string-array verify), so the result stays exact.  The one caveat:
two DISTINCT grams colliding on the same 64-bit key make the canonical
order non-total at that key, which could in principle drop a required
prefix element — ~2^-64 per gram pair, the same accepted odds as the
convergence signature in ``dedup.clusters``.

Scale shape: three shuffles over the (gram, doc) pairs — DF groupBy, the
per-doc rank (window on doc_id), and the candidate self-join on the gram
key — each linear in corpus gram count, plus the verify join over
candidates only.  At 100 TB the dominant cost is the gram explode, which
is proportional to total token count, the same as the MinHash signature
pass; use MinHash when an approximate answer is acceptable and this
operator when the contract requires every qualifying pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .minhash import shingles_col


def _prefix_index(sh: DataFrame, id_col: str, threshold: float) -> DataFrame:
    """(g, id, sz) rows for each doc's prefix grams in canonical order.

    ``g`` is the 64-bit gram hash, ``sz`` the doc's full gram-set size.

    Shuffle shape (all linear in corpus gram count): the exploded
    (gram, doc) rows shuffle by ``g`` ONCE — Spark serves both the DF
    aggregate and the join probe from the same exchange (ReusedExchange),
    and the aggregate output is already hash-partitioned by ``g`` so the
    join's build side needs no exchange — then by ``id`` for the per-doc
    prefix cut.  The per-doc cut is a map-side-combinable
    ``collect_list`` + per-doc ``array_sort``/``slice`` rather than a
    ``row_number`` window: no partition-wide sort, and partial aggregation
    shrinks the doc-keyed shuffle.  Per-doc memory for the collected
    (df, g) array is O(doc grams) — the same bound as the doc's shingle
    array (and its text row) already impose."""
    gd = (sh.select(F.col(id_col), F.size("shingles").alias("sz"),
                    F.explode("shingles").alias("gram"))
          .select(id_col, "sz", F.xxhash64("gram").alias("g")))
    dfreq = gd.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    plen = (F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1).cast("int")
    per_doc = (gd.join(dfreq, "g")
               .groupBy(id_col)
               .agg(F.first("sz").alias("sz"),
                    F.collect_list(F.struct("df", "g")).alias("__dg")))
    return (per_doc
            .select(id_col, "sz",
                    F.explode(F.slice(F.array_sort("__dg"), 1, plen))
                    .alias("__p"))
            .select(F.col("__p.g").alias("g"), id_col, "sz"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.8,
                        shingle_k: int = 3) -> DataFrame:
    """(id_a, id_b, jaccard) for ALL pairs with exact word-``shingle_k``-gram
    Jaccard >= ``threshold`` (id_a < id_b) — no approximation.

    ``threshold`` must be > 0 (prefix filtering is vacuous at t=0, where the
    answer is the full cross product anyway).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    base = df.filter(F.col(text_col).isNotNull())
    sh = (base.select(F.col(id_col),
                      shingles_col(F.col(text_col), shingle_k).alias("shingles"))
          .filter(F.size("shingles") > 0))
    pref = _prefix_index(sh, id_col, threshold)
    a = pref.select("g", F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    b = pref.select("g", F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    # persisted before fan-out: the broadcast id-set below is materialized
    # by a separate AQE subquery job that compiles its own exchanges and
    # would otherwise re-run the whole prefix-index self-join (same
    # measured pathology as minhash.near_dup_pairs — see its docstring);
    # cached blocks are shared across jobs, shuffle files are not
    from pyspark import StorageLevel

    cands = (a.join(b, "g")
             .filter((F.col("id_a") < F.col("id_b"))
                     # length filter: J <= min(|A|,|B|) / max(|A|,|B|)
                     & (F.col("sz_a") * F.lit(1.0) >= threshold * F.col("sz_b"))
                     & (F.col("sz_b") * F.lit(1.0) >= threshold * F.col("sz_a")))
             .select("id_a", "id_b")
             .distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))
    cand_ids = (cands.select(F.col("id_a").alias(id_col))
                .union(cands.select(F.col("id_b").alias(id_col)))
                .distinct())
    cs = (base.join(F.broadcast(cand_ids), id_col, "semi")
          .select(F.col(id_col),
                  shingles_col(F.col(text_col), shingle_k).alias("shingles")))
    j = (cands
         .join(cs.withColumnRenamed(id_col, "id_a")
                 .withColumnRenamed("shingles", "sh_a"), "id_a")
         .join(cs.withColumnRenamed(id_col, "id_b")
                 .withColumnRenamed("shingles", "sh_b"), "id_b"))
    jac = (F.size(F.array_intersect("sh_a", "sh_b"))
           / F.size(F.array_union("sh_a", "sh_b")))
    from ..spark.cacheutil import tag_intermediates
    out = (j.withColumn("jaccard", jac)
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard"))
    return tag_intermediates(out, cands)
