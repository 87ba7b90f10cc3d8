"""Deduplication family: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Designed around the 100 TB constraint: nothing here ever materializes the
full O(n^2) pair space. Candidate pairs always come from an equi-join on
a bucket key (shingle, LSH band hash, or SimHash band), which Spark
executes as a plain shuffle join; exact verification runs only on the
candidates. All hashing is xxhash64 (JVM-side, whole-stage codegen) —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text, word_shingles
from .core import ensure_parallelism


def canonicalize_exact(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact dedup: map every row to the min-id row with identical
    normalized text. One shuffle on the fingerprint.

    Adds ``fingerprint`` (md5 of normalized text), ``canonical_id``
    (min id among identical texts) and ``is_dup``.
    """
    from pyspark.sql import Window

    fp = F.md5(normalized_text(text_col))
    w = Window.partitionBy("fingerprint")
    return (
        df.withColumn("fingerprint", fp)
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_dup", (F.col(id_col) != F.col("canonical_id")).cast("int"))
    )


def shingle_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Exact pairwise Jaccard similarity over n-word shingles.

    Pair generation is an equi-join on the shingle value (not a cross
    join): docs sharing zero shingles never meet. Columns:
    ``doc_a, doc_b, inter, size_a, size_b, jaccard``.

    ``max_df`` caps shingle document frequency: shingles appearing in
    more than ``max_df`` docs are dropped *before* the posting lists are
    collected, so one stop-shingle shared by the whole corpus can never
    become a mega-bucket (its posting list alone would be O(corpus), and
    its pair expansion O(corpus²)). The df count rides the same
    shuffle-on-shingle the posting list needs (a window count — no extra
    exchange; oversized groups spill, not OOM). Jaccard for surviving
    pairs uses the *uncapped* shingle-set sizes, so scores of pairs that
    shared a dropped stop-shingle are slight underestimates — standard
    near-dup practice, preserves the top-pair ranking for any threshold
    well above the true near-dup overlap.
    """
    sh = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), word_shingles(text_col, n).alias("shingles")
    ).withColumn("sh_size", F.size("shingles"))
    # One shuffle: group docs by (64-bit hashed) shingle, expand each
    # posting list into its pairs. Cheaper than the equivalent self-join
    # (which would shuffle the exploded table twice AND recompute the
    # shingling subtree per side). Hash collisions at 64 bits are
    # ~1e-9 at billions of distinct shingles — acceptable.
    # explode_outer + post-filter, NOT explode: plain explode makes
    # Catalyst infer a size(shingles)>0 filter containing the whole
    # shingling expression and push it below the repartition — i.e. the
    # entire shingle computation runs (twice) inside the narrow scan
    # stage. explode_outer keeps the exchange as the stage boundary.
    exploded = (
        sh.select("doc", "sh_size", F.explode_outer("shingles").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .select("doc", "sh_size", F.xxhash64("shingle").alias("sh"))
    )
    if max_df is not None:
        # Count df over the same hash-partitioning the posting-list
        # groupBy needs: Catalyst reuses the exchange, so the cap costs
        # zero extra shuffles, and high-df rows are filtered before any
        # collect_list materializes them.
        dfw = Window.partitionBy("sh")
        exploded = exploded.withColumn("df", F.count("*").over(dfw)).filter(
            F.col("df") <= max_df
        ).drop("df")
    posting = exploded.groupBy("sh").agg(
        F.collect_list(F.struct("doc", "sh_size")).alias("members")
    )
    pairs = (
        posting.select(F.explode("members").alias("a"), "members")
        .select("a", F.explode("members").alias("b"))
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.sh_size").alias("size_a"),
            F.col("b.sh_size").alias("size_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    return pairs.withColumn(
        "jaccard",
        F.col("inter")
        / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
    )


def cooccurrence_pairs(
    items: DataFrame,
    id_col: str,
    bucket_cols: list[str],
    max_bucket: int | None = None,
) -> DataFrame:
    """Co-occurrence pair counts from an (item, bucket) membership table.

    Two items co-occur once per shared bucket; output is
    ``(u, v, i)`` with ``u < v`` and ``i`` = number of shared buckets —
    the intersection count a set-similarity (Jaccard) graph build needs.

    ``max_bucket`` caps bucket size the same way ``max_df`` caps shingle
    document frequency in :func:`shingle_jaccard_pairs`: buckets with
    more than ``max_bucket`` members are dropped *before* the pair
    self-join, because a ubiquitous bucket (every item present — e.g.
    every user active on one (event_type, day) at 100x scale) would
    expand to O(b²) candidate pairs while carrying no discriminative
    signal for set similarity. The bucket-size count rides the same
    shuffle the pair join needs (a window count over the bucket key — no
    extra exchange), so the cap is free, and the pair stage is bounded
    by ``max_bucket² × n_buckets`` instead of O(corpus²).
    """
    u = items.select(
        F.col(id_col).alias("u"), *[F.col(c) for c in bucket_cols]
    )
    if max_bucket is not None:
        # Posting-list path: one shuffle on the bucket key builds each
        # bucket's member list (memory-bounded by the cap — the filter
        # runs before any pair materializes), then pairs explode
        # in-stage. Beats the equivalent self-join, which computes the
        # upstream `items` lineage once per join side and shuffles it
        # twice.
        plists = (
            u.groupBy(*bucket_cols)
            .agg(F.sort_array(F.collect_list("u")).alias("members"))
            .filter(F.size("members") <= max_bucket)
            # The posting table is bucket-count sized — tiny — so AQE
            # coalesces its shuffle output to ~1 partition BEFORE the
            # O(b²) pair fan-out below, serializing the expensive stage
            # onto one core. A user repartition is exempt from AQE
            # coalescing and keys the fan-out across the cluster
            # (measured 6.1s -> 3.4s on the sf0.1 co-visitation build).
            .repartition(items.sparkSession.sparkContext.defaultParallelism)
        )
        # members is sorted, so slicing past the first explode's
        # position yields exactly the v > u half — the pair stream is
        # half the naive explode² and no u<v post-filter runs.
        return (
            plists.select(
                F.posexplode("members").alias("pos", "u"), "members"
            )
            .select(
                "u",
                F.explode(
                    F.slice(
                        "members",
                        F.col("pos") + F.lit(2),
                        F.greatest(
                            F.size("members") - F.col("pos") - 1, F.lit(0)
                        ),
                    )
                ).alias("v"),
            )
            .groupBy("u", "v")
            .agg(F.count("*").alias("i"))
        )
    v = u.select(F.col("u").alias("v"), *bucket_cols)
    return (
        u.join(v, bucket_cols)
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("i"))
    )


def _perm_hash(col, seed: int):
    """Deterministic per-permutation 64-bit hash of a shingle string."""
    return F.xxhash64(F.concat(F.lit(f"mh{seed}|"), col))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 16,
) -> DataFrame:
    """MinHash signature per document: for each of ``num_perm`` seeded hash
    functions, the min hash over the doc's shingles. Schema:
    ``(doc, sig: array<bigint>)``. One shuffle (groupBy doc)."""
    sh = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("doc"),
            F.explode_outer(word_shingles(text_col, n)).alias("shingle"),
        )
        .filter(F.col("shingle").isNotNull())
    )
    mins = sh.groupBy("doc").agg(
        *[F.min(_perm_hash(F.col("shingle"), i)).alias(f"h{i}") for i in range(num_perm)]
    )
    return mins.select(
        "doc", F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH candidate pairs with estimated Jaccard.

    Signatures are banded (``bands`` bands of ``num_perm/bands`` rows);
    docs colliding in >=1 band become candidates via an equi-join on
    (band_idx, band_hash) — the 100 TB path, since candidate volume is
    driven by true similarity, not corpus size. ``est_jaccard`` is the
    fraction of matching signature positions.
    """
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_perm)
    banded = sig.select(
        "doc",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", i * rows_per_band + j + 1)
                                    for j in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc", "sig", "band.band_idx", "band.band_hash")
    # Posting-list pair expansion, not an a×b self-join: a self-join
    # would execute the whole signature pipeline (explode + 16-way min
    # agg) twice and shuffle both sides. One groupBy on the bucket key
    # computes signatures once; pairs expand from each bucket's member
    # list. Bucket membership is tiny (similar docs only), so the
    # collect_list stays small — skew in a pathological bucket is
    # bounded by banding width at 100 TB.
    posting = banded.groupBy("band_idx", "band_hash").agg(
        F.collect_list(F.struct("doc", "sig")).alias("members")
    )
    cands = (
        posting.filter(F.size("members") > 1)
        .select(F.explode("members").alias("a"), "members")
        .select("a", F.explode("members").alias("b"))
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda m: m == 1,
        )
    )
    return cands.select(
        "doc_a",
        "doc_b",
        (matches / F.lit(float(num_perm))).alias("est_jaccard"),
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16
) -> DataFrame:
    """Per-document SimHash over whitespace tokens: bit j of the hash is the
    sign of sum over tokens of (+1 if bit j of xxhash64(token) else -1).

    Computed as explode -> groupBy(doc) with one conditional sum per bit —
    a single shuffle, all codegen. Schema: ``(doc, simhash: bigint)``.
    """
    toks = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("doc"),
            F.explode_outer(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok").isNotNull())
    )
    h = F.xxhash64(F.col("tok"))
    sums = toks.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    sim = None
    for j in range(bits):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return sums.select("doc", sim.cast("bigint").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    max_hamming: int = 3,
    band_bits: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= ``max_hamming``.

    Candidate generation: split each hash into ``bits/band_bits`` bands and
    equi-join on (band_idx, band_value) — two hashes within Hamming d
    collide in >=1 band whenever d < bits/band_bits (pigeonhole), so with
    16 bits / 4-bit bands this is exact for d <= 3. No cross join.
    """
    sh = simhash(df, id_col, text_col, bits)
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    banded = sh.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftright("simhash", i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc", "simhash", "band.band_idx", "band.band_val")
    # Posting-list expansion (see minhash_lsh_pairs): computes the
    # simhash pipeline once instead of twice and replaces the self-join
    # shuffle pair with a single groupBy on the band bucket.
    posting = banded.groupBy("band_idx", "band_val").agg(
        F.collect_list(F.struct("doc", "simhash")).alias("members")
    )
    return (
        posting.filter(F.size("members") > 1)
        .select(F.explode("members").alias("a"), "members")
        .select("a", F.explode("members").alias("b"))
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_iters: int = 20,
) -> DataFrame:
    """Transitive near-dup clusters: connected components of the Jaccard
    pair graph (edges = pairs with jaccard >= threshold), labels = min
    doc id reachable. The canonical "keep one per cluster" dedup step
    that follows candidate generation in a training-data pipeline.

    Iterative min-label propagation WITH pointer jumping: each round (a)
    takes the min label over edge neighbors, then (b) replaces every
    label by its label's label (path halving), so convergence is
    O(log diameter) — max_iters=20 covers any component a real corpus
    can produce. ``localCheckpoint`` after every round cuts the lineage
    — without it the plan doubles per iteration and the job dies long
    before 100 TB. Edges are checkpointed once so the expensive shingle
    join never re-executes. Driver sees only per-round changed COUNTS
    (scalars), never row data. Raises RuntimeError instead of returning
    partially-propagated labels if max_iters is ever hit.

    Scale shape: the rounds run on the EDGE-INCIDENT doc subset only.
    An isolated doc (no jaccard>=threshold neighbor) keeps its own id
    forever — initial label is the own id, prop never reaches it, and
    min(own) = own — so iterating it is pure waste; at the 100 TB
    design point the near-dup subgraph is a small fraction of the
    corpus, and every per-round shuffle is sized by it instead of by
    the corpus. Isolated docs are appended once at the end with their
    own id (one anti-join, no shuffle of the rounds). Labels stay
    closed over the subgraph: a component's min doc id is itself
    edge-incident, so the pointer-jump parent lookup never leaves it.
    """
    pairs = shingle_jaccard_pairs(df, id_col, text_col, n).filter(
        F.col("jaccard") >= threshold
    )
    # both orientations via one explode, NOT half.union(half.reversed):
    # union branches share no subtree at runtime, so the reversed branch
    # would re-execute the whole shingle-join pipeline a second time
    # (the a357/q146 lesson)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("src"),
                        F.col("doc_b").alias("dst"),
                    ),
                    F.struct(
                        F.col("doc_b").alias("src"),
                        F.col("doc_a").alias("dst"),
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint()
    )

    # edge-incident docs only (edges carry both orientations, so src
    # alone covers every endpoint)
    labels = (
        edges.select(F.col("src").alias("doc"))
        .distinct()
        .withColumn("cluster_id", F.col("doc"))
        .localCheckpoint()
    )
    done = None
    for _ in range(max_iters):
        prop = labels.join(edges, labels["doc"] == edges["src"]).select(
            F.col("dst").alias("doc"),
            "cluster_id",
            F.lit(None).cast(labels.schema["cluster_id"].dataType).alias("old"),
        )
        # carry the previous label through the aggregate: the labels
        # branch contributes exactly one row per doc, so max(old)
        # recovers it — the round's changed count then needs no
        # new-vs-old join, just a filter over the materialized frame.
        # checkpoint before the self-referencing parent join: stepped
        # appears on both sides, and without materialization the whole
        # union+aggregate subtree would execute twice per round
        stepped = (
            labels.select("doc", "cluster_id", F.col("cluster_id").alias("old"))
            .unionByName(prop)
            .groupBy("doc")
            .agg(
                F.min("cluster_id").alias("cluster_id"),
                F.max("old").alias("old"),
            )
            .localCheckpoint()
        )
        # pointer jumping: labels are doc ids, so each label has its own
        # label — follow it one hop (label monotonically decreases, so
        # the parent's label is always <= ours)
        parent = stepped.select(
            F.col("doc").alias("p"), F.col("cluster_id").alias("pl")
        )
        new_labels = (
            stepped.join(parent, stepped["cluster_id"] == parent["p"])
            .select("doc", F.col("pl").alias("cluster_id"), "old")
            .localCheckpoint()
        )
        changed = new_labels.filter(
            F.col("cluster_id") != F.col("old")
        ).count()
        labels = new_labels.select("doc", "cluster_id")
        if changed == 0:
            done = labels
            break
    if done is None:
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iters} iterations; "
            "component diameter > 2^max_iters is not a plausible corpus — "
            "check the edge threshold"
        )
    # isolated docs never entered the rounds; their label is their id
    isolated = (
        df.select(F.col(id_col).alias("doc"))
        .join(done.select("doc"), "doc", "left_anti")
        .withColumn("cluster_id", F.col("doc"))
    )
    return done.unionByName(isolated)
