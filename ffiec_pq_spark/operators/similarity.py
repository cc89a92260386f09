"""Similarity search over embedding columns (``array<float>``).

- ``cosine`` / ``dot``: pure column expressions (``zip_with`` +
  ``aggregate`` left-fold in doubles — deterministic, codegen'd, no UDF).
- ``ann_topk_bruteforce``: score every row against a probe vector and
  take top-k.  Spark plans this as TakeOrderedAndProject: per-partition
  local top-k then a k-row merge on the driver — no global sort, so the
  same plan is the right baseline at any scale.
- ``cosine_pairs_within``: all-pairs cosine above a threshold *within a
  partition key* (e.g. label or LSH bucket) — the pruned near-dup path.
- ``hyperplane_lsh_buckets``: random-hyperplane signature (sign bits of
  dot products with fixed pseudo-random planes) giving each vector a
  bucket key; bucket-join + verify = the scale path for ANN when a full
  cross join is infeasible.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ffiec_pq_spark.functions.lits import double_array

_PAIR_IDS = itertools.count()

# Auto-created kNN spill dirs pending removal at interpreter exit: ONE
# module-level atexit handler over the set (repeated knn_exact_topk
# calls in a long-lived driver must not stack one handler per call).
# Callers that fully materialize a spilled result may discard its dir
# early via knn_discard_spill().
_PENDING_SPILL_DIRS: set[str] = set()
_SPILL_ATEXIT_REGISTERED = False


def _register_spill_dir(path: str) -> None:
    global _SPILL_ATEXIT_REGISTERED
    _PENDING_SPILL_DIRS.add(path)
    if not _SPILL_ATEXIT_REGISTERED:
        import atexit

        atexit.register(_cleanup_spill_dirs)
        _SPILL_ATEXIT_REGISTERED = True


def _cleanup_spill_dirs() -> None:
    import shutil

    while _PENDING_SPILL_DIRS:
        shutil.rmtree(_PENDING_SPILL_DIRS.pop(), ignore_errors=True)


def knn_discard_spill(path: str) -> None:
    """Free one auto-created kNN spill dir early (after the caller has
    fully materialized / persisted the returned candidate relation —
    the lazy parquet scan over it becomes unreadable)."""
    import shutil

    _PENDING_SPILL_DIRS.discard(path)
    shutil.rmtree(path, ignore_errors=True)


def _threshold_pairs(scored: DataFrame, threshold: float) -> DataFrame:
    """Filter scored pairs on the raw cosine and project it rounded.

    The raw score is projected as a real column behind an ``observe``
    fence first: filtering directly on the cosine expression would let
    Catalyst substitute it into both Filter and Project, evaluating the
    dot+norm folds twice per surviving pair (no CSE across operators).
    The fence also emits a free candidate-pair count metric."""
    fenced = scored.observe(
        f"cosine_pairs_{next(_PAIR_IDS)}", F.count(F.lit(1)).alias("n_candidates")
    )
    return fenced.filter(F.col("_raw") >= threshold).select(
        "part", "id_a", "id_b", F.round("_raw", 6).alias("score")
    )


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a deterministic left fold in doubles."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def ann_topk_bruteforce(
    df: DataFrame,
    probe: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k rows by cosine similarity to a constant probe vector."""
    probe_col = double_array(probe)
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), probe_col), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def _pairs_exact(
    df: DataFrame, part_col: str, threshold: float, vec_col: str, id_col: str
) -> DataFrame:
    """Exhaustive within-partition pairs (quadratic in the group size).

    Norms are hoisted to one computation per VECTOR before the
    self-join — the per-pair work is the dot product alone, with the
    arithmetic unchanged (``dot/(na*nb)`` is exactly ``cosine``)."""
    a = df.select(
        F.col(part_col).alias("part"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("_na"),
    )
    b = df.select(
        F.col(part_col).alias("part"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("_nb"),
    )
    scored = (
        a.join(b, "part")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "part", "id_a", "id_b",
            (
                dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb"))
            ).alias("_raw"),
        )
    )
    return _threshold_pairs(scored, threshold)


def _pairs_lsh(
    df: DataFrame,
    part_col: str,
    threshold: float,
    vec_col: str,
    id_col: str,
    dim: int,
    n_planes: int,
) -> DataFrame:
    """Near-dup pairs within a partition via multi-probe hyperplane LSH:
    side A keeps its exact signature, side B explodes to its signature
    plus every radius-1 flip, so any pair whose signatures differ in at
    most one bit becomes a candidate; candidates are verified with exact
    cosine.  Cost ~ (n_planes+1)·n per group instead of n² — the reroute
    for groups too hot for the exhaustive path (pairs with signature
    Hamming distance >= 2 are sacrificed, the standard LSH recall
    tradeoff)."""
    # Alias the signature frame's id before joining: a bare drop("id")
    # would remove BOTH copies when the caller's id_col is itself "id".
    sig = hyperplane_lsh_buckets(df, dim, n_planes, vec_col, id_col).select(
        F.col("id").alias("_sig_id"), "bucket"
    )
    dd = df.join(sig, df[id_col] == F.col("_sig_id")).drop("_sig_id")
    a = dd.select(
        F.col(part_col).alias("part"),
        F.col(id_col).alias("id_a"),
        F.col("bucket").alias("pb"),
    )
    b = dd.select(
        F.col(part_col).alias("part"),
        F.col(id_col).alias("id_b"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << p).cast("long"))
                    for p in range(n_planes)
                ],
            )
        ).alias("pb"),
    )
    cand = (
        a.join(b, ["part", "pb"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("part", "id_a", "id_b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    scored = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "part", "id_a", "id_b",
            cosine(F.col("va"), F.col("vb")).alias("_raw"),
        )
    )
    return _threshold_pairs(scored, threshold)


def cosine_pairs_within(
    df: DataFrame,
    part_col: str,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_group_size: int | None = None,
    dim: int | None = None,
    n_planes: int = 8,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine >= threshold, restricted to equal
    ``part_col`` (label / bucket) — turns O(n²) into Σ O(n_bucket²).

    ``max_group_size`` is the hot-label guard: groups above it are
    rerouted through the multi-probe LSH candidate path (``_pairs_lsh``)
    instead of the exhaustive self-join, so one label holding half the
    corpus cannot degenerate the job to all-pairs.  Requires ``dim``
    when set.  Unset (default) keeps the exhaustive, oracle-exact
    behavior on every group."""
    from ffiec_pq_spark.session import spread

    df = spread(df)
    if max_group_size is None:
        return _pairs_exact(df, part_col, threshold, vec_col, id_col)
    if dim is None:
        raise ValueError("max_group_size requires dim (for the LSH planes)")
    counts = df.groupBy(part_col).agg(F.count(F.lit(1)).alias("_n"))
    flagged = df.join(F.broadcast(counts), part_col)
    small = flagged.filter(F.col("_n") <= max_group_size).drop("_n")
    hot = flagged.filter(F.col("_n") > max_group_size).drop("_n")
    return _pairs_exact(small, part_col, threshold, vec_col, id_col).unionByName(
        _pairs_lsh(hot, part_col, threshold, vec_col, id_col, dim, n_planes)
    )


def _pseudo_plane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane (no RNG: values
    from a fixed integer mix so Spark and tests agree byte-for-byte)."""
    vals = []
    x = (plane_idx + 1) * 0x9E3779B97F4A7C15 % (2**61 - 1)
    for _ in range(dim):
        x = (x * 6364136223846793005 + 1442695040888963407) % (2**63)
        vals.append(((x >> 11) / float(2**52)) * 2.0 - 1.0)
    return vals


def hyperplane_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, bucket) where bucket = sign-bit signature against n_planes
    fixed hyperplanes.  Cosine-similar vectors land in the same bucket
    with high probability; bucket-join + exact verify = scalable ANN."""
    sig = None
    for p in range(n_planes):
        plane = double_array(_pseudo_plane(dim, p))
        bit = (dot(F.col(vec_col), plane) > 0).cast("long") * F.lit(2**p).cast("long")
        sig = bit if sig is None else sig + bit
    return df.select(F.col(id_col).alias("id"), sig.alias("bucket"))


def ivf_centroid(dim: int, cell_idx: int) -> list[float]:
    """Deterministic coarse-quantizer centroid (fixed pseudo-random
    direction; a production build would k-means these — the query plan
    is identical, only the constants change)."""
    return _pseudo_plane(dim, 100 + cell_idx)


def ivf_cell(
    vec: Column,
    dim: int,
    n_cells: int,
    centroids: list[list[float]] | None = None,
) -> Column:
    """Argmax-cosine cell assignment as one column expression: array_max
    over (score, cell) structs — ties break to the lowest cell index.

    ``centroids`` defaults to the fixed pseudo-random directions; pass
    the output of ``kmeans_fit`` (operators/kmeans.py) for a TRAINED
    coarse quantizer — data-shaped cells concentrate each probe's true
    neighbors into fewer cells, so the same nprobe scans less or
    recalls more."""
    cents = centroids or [ivf_centroid(dim, j) for j in range(n_cells)]
    entries = []
    for j, c in enumerate(cents):
        cent = double_array(c)
        entries.append(
            F.struct(
                cosine(vec, cent).alias("s"),
                F.lit(n_cells - 1 - j).alias("negc"),
            )
        )
    best = F.array_max(F.array(*entries))
    return (F.lit(n_cells - 1) - best["negc"]).alias("cell")


def probe_cells(
    probe: list[float],
    dim: int,
    n_cells: int,
    nprobe: int,
    centroids: list[list[float]] | None = None,
) -> list[int]:
    """Driver-side: the nprobe cells whose centroids are most similar to
    the probe (the IVF serving step's cell shortlist)."""
    cents = centroids or [ivf_centroid(dim, j) for j in range(n_cells)]

    def cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return d / (na * nb)

    scored = sorted(
        ((cos(probe, c), -j) for j, c in enumerate(cents)),
        reverse=True,
    )
    return [-negj for _, negj in scored[:nprobe]]


def ann_topk_ivf(
    df: DataFrame,
    probe: list[float],
    dim: int,
    k: int = 10,
    n_cells: int = 4,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
    exclude_ids: DataFrame | None = None,
) -> DataFrame:
    """IVF-pruned top-k: assign every vector to its nearest coarse
    centroid, scan only the ``nprobe`` cells nearest the probe, exact
    cosine re-rank inside them.

    At scale the cell id is a parquet partition column, so the cell
    filter becomes partition pruning and the scan touches nprobe/n_cells
    of the data; here the assignment is computed on the fly (one
    narrow projection, no shuffle — top-k is TakeOrderedAndProject).
    Pass ``centroids=kmeans_fit(df, ...)`` for the trained quantizer
    (recall bound pinned in tests/test_ann_recall.py).

    ``exclude_ids``: a DataFrame of tombstoned ids (column ``id_col``)
    removed from the shortlist with a BROADCAST ANTI-JOIN before the
    re-rank — index maintenance without a rebuild: at 100 TB the cell
    layout stays put, deletes accumulate in a small tombstone table,
    and every search anti-joins it (compaction rewrites the cells on
    its own schedule)."""
    cells = probe_cells(probe, dim, n_cells, nprobe, centroids)
    assigned = df.withColumn(
        "cell", ivf_cell(F.col(vec_col), dim, n_cells, centroids)
    )
    shortlist = assigned.filter(F.col("cell").isin(cells))
    if exclude_ids is not None:
        shortlist = shortlist.join(
            F.broadcast(exclude_ids.select(id_col)), id_col, "left_anti"
        )
    return ann_topk_bruteforce(shortlist, probe, k, vec_col, id_col)


def knn_exact_topk(
    t_df: DataFrame,
    q_df: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    carry_cols: tuple[str, ...] = ("label",),
    tile_size: int = 8192,
    max_union_tiles: int = 4,
    spill_dir: str | None = None,
) -> DataFrame:
    """EXACT k-nearest-neighbor candidates of every probe in ``q_df``
    against the corpus ``t_df`` by cosine: rows ``(q_id, t_id, *carry,
    s)`` guaranteed to contain each probe's true top-k under the order
    ``(s DESC, t_id ASC)`` with ``s`` rounded to 6 dp.

    This replaces the broadcast-cartesian + full-pair window shape
    (which materializes |corpus|x|probes| rows through a shuffle and
    pays a per-pair JVM fold) with the standard distributed brute-force
    kNN layout:

    - probes are STREAMED driver-side (``toLocalIterator``: one probe
      partition resident at a time, never the whole probe set) and cut
      into bounded TILES of ``tile_size`` (at 100 TB the tile loop is
      the outer batch dimension — each tile is one broadcast + one
      corpus pass; tiles are independent so the passes pipeline);
    - each corpus partition computes the tile's scores as ONE float64
      BLAS matmul inside ``mapInPandas`` (Arrow-batched; the per-pair
      cost is a fused multiply-add instead of a per-element
      ``zip_with``/``aggregate`` fold — ~100x less CPU for the same
      arithmetic, summation-order differences live far below the 6-dp
      round) and emits only its LOCAL top-k per probe, keeping every
      row tied with the k-th value so no global winner can be dropped
      at a batch boundary;
    - the union of local winners (``<= partitions * |tile| * (k+ties)``
      rows, NOT n*m) is re-ranked exactly by the caller's global
      window.

    Exactness: scores are rounded to 6 dp BEFORE ranking on both the
    local and global passes (matching the SQL oracle's
    ``round(.., 6)`` then ``row_number``); a row can only be pruned
    locally when its rounded score is strictly below its batch's k-th
    rounded score, and the true global top-k under (s DESC, t_id ASC)
    are each in their own batch's kept set.

    Plan-size bound: up to ``max_union_tiles`` tile branches are unioned
    into one lazy plan (the common case — a bounded probe slice).
    BEYOND that budget the builder switches to job-per-tile: each tile
    RUNS as its own job at construction time (the spill IS the action —
    callers that only want the plan for explain/dump tooling should keep
    probes within the union budget), its candidates are appended to a
    FRESH unique subdir of ``spill_dir``, and the returned DataFrame is
    the parquet scan of that spill dir — so plan size, driver memory,
    and per-tile cost stay FLAT in the number of tiles instead of
    growing a union branch + resident broadcast per tile.  ``tile_size``
    is the probe-budget knob: probes resident per pass = tile_size
    vectors.

    Spill-dir contract (cluster safety): with ``spill_dir=None`` the
    spill falls back to a DRIVER-LOCAL temp dir, which only the driver
    and same-host executors can see — on a multi-node master, executor
    task commits would land on disks the final driver-side
    ``spark.read.parquet`` cannot reach and the result would be silently
    missing candidates.  The builder therefore RAISES ``ValueError`` if
    the spill path is reached with ``spill_dir=None`` on a non-local
    master; pass a SHARED filesystem URI (object store / DFS) there.
    On local masters the auto tempdir is registered for removal at
    interpreter exit."""
    import numpy as np
    import pandas as pd

    from ffiec_pq_spark.session import spread

    spark = t_df.sparkSession
    carry_fields = ", ".join(
        f"{c} {t_df.schema[c].dataType.simpleString()}" for c in carry_cols
    )
    schema = f"q_id long, t_id long, {carry_fields}, s double"
    src = spread(t_df.select(id_col, *carry_cols, vec_col))
    tiles: list = []  # (DataFrame, broadcast) pairs while lazily unioned
    spill_path: str | None = None

    def _tile_iter():
        buf: list = []
        for r in q_df.select(id_col, vec_col).toLocalIterator():
            buf.append(r)
            if len(buf) == tile_size:
                yield buf
                buf = []
        if buf:
            yield buf

    def _spill(df, bc_):
        """Run one tile as its own job: append its candidates to the
        spill dir, then free its probe broadcast immediately."""
        df.write.mode("append").parquet(spill_path)
        bc_.destroy()

    for tile in _tile_iter():
        qids = np.array([r[id_col] for r in tile], dtype=np.int64)
        Q = np.array([r[vec_col] for r in tile], dtype=np.float64)
        nq = np.sqrt((Q * Q).sum(axis=1))
        bc = spark.sparkContext.broadcast((qids, Q, nq))

        def gen(batches, _bc=bc):
            qids_, Q_, nq_ = _bc.value
            for pdf in batches:
                B = len(pdf)
                if B == 0:
                    continue
                T = np.array(list(pdf[vec_col]), dtype=np.float64)
                nt = np.sqrt((T * T).sum(axis=1))
                S = np.round(
                    (T @ Q_.T) / (nt[:, None] * nq_[None, :]), 6
                )
                kk = min(k, B)
                # k-th largest rounded score per probe; keep EVERY row
                # >= it (ties at the boundary stay in, so the global
                # re-rank's tie-break on t_id still sees all winners)
                vk = np.partition(S, B - kk, axis=0)[B - kk]
                rows, cols = np.nonzero(S >= vk)
                out = {
                    "q_id": qids_[cols],
                    "t_id": pdf[id_col].to_numpy()[rows],
                }
                for c in carry_cols:
                    out[c] = pdf[c].to_numpy()[rows]
                out["s"] = S[rows, cols]
                yield pd.DataFrame(out)

        tile_df = src.mapInPandas(gen, schema)
        if spill_path is None and len(tiles) < max_union_tiles:
            tiles.append((tile_df, bc))
            continue
        if spill_path is None:
            # (max_union_tiles + 1)-th tile: switch to job-per-tile —
            # flush the accumulated lazy branches, then stream the rest
            import tempfile
            import uuid

            # a FRESH unique subdir per invocation: appending into a
            # caller-supplied dir directly would merge a previous
            # call's candidate files into this result
            if spill_dir is not None:
                spill_path = spill_dir.rstrip("/") + (
                    "/knn_tiles_" + uuid.uuid4().hex
                )
            else:
                master = spark.sparkContext.master or ""
                if not master.startswith("local"):
                    # free the broadcasts already shipped for the
                    # buffered tiles (and this tile's) before raising —
                    # they would otherwise sit on the executors until GC
                    for _, buffered_bc in tiles:
                        buffered_bc.destroy()
                    bc.destroy()
                    raise ValueError(
                        "knn_exact_topk: probe count exceeds the union "
                        "budget (max_union_tiles*tile_size) so tile "
                        "candidates must spill, but spill_dir=None and "
                        f"master={master!r} is not local — a driver-local "
                        "temp dir would silently lose executor task "
                        "commits. Pass spill_dir= a SHARED filesystem "
                        "URI (object store / DFS) visible to driver and "
                        "all executors."
                    )
                spill_path = tempfile.mkdtemp(prefix="knn_tiles_")
                _register_spill_dir(spill_path)
            for buffered_df, buffered_bc in tiles:
                _spill(buffered_df, buffered_bc)
            tiles = []
        _spill(tile_df, bc)
    if spill_path is not None:
        return spark.read.parquet(spill_path)
    if not tiles:
        return spark.createDataFrame([], schema)
    cand = tiles[0][0]
    for extra, _ in tiles[1:]:
        cand = cand.unionByName(extra)
    return cand


def semantic_dedup_counts(
    emb: DataFrame,
    asg: DataFrame,
    tau: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int | None = None,
) -> DataFrame:
    """Per-cell SemDeDup counts ``(cell, n_members, n_dropped,
    n_kept)``: a vector is DROPPED iff some smaller-id vector in its
    cell has cosine >= ``tau`` with it (greedy keep-lowest-id).

    Exact-duplicate collapse (the same duplicate-proofing as
    ``jaccard_pairs``/``minhash_near_dups``): byte-identical vectors
    share a representative (min id), the quadratic cosine pairing runs
    on REPRESENTATIVES only, and copy groups contribute their drops
    arithmetically —

    - every non-min copy of a group with nonzero norm is dropped
      (identical vectors score exactly 1.0 >= tau; zero-norm copies
      produce NULL cosine in the naive pipeline and are never dropped,
      so they are excluded);
    - the group MIN is dropped iff a rep of another same-cell group
      with a SMALLER min id scores >= tau (rep ids are group minima,
      so rep-id comparison is exactly the naive any-smaller-copy
      test).

    Output is identical to the naive all-pairs formulation (the
    registered query's SQL oracle replays the naive form, so the
    driver's hash compare proves the rewrite); cost on a corpus where
    each vector repeats d times stays ~1x the distinct corpus instead
    of d^2.  ``asg`` is ``(id, cell)`` for EVERY vector (cell
    assignment is a pure function of the vector, so copies always
    land with their representative)."""
    from pyspark.sql import Window

    e = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("_chash", F.md5(F.col("v").cast("string")))
    w = Window.partitionBy("_chash")
    grouped = e.withColumn("rep", F.min("vid").over(w)).withColumn(
        "g", F.count(F.lit(1)).over(w)
    )
    # persisted + materialized eagerly: reps feeds BOTH pair sides plus
    # the within-group rollup (three plan references — Spark does not
    # dedupe common subtrees, so unpersisted the content-hash window
    # and the assignment join run once per reference); one row per
    # DISTINCT vector, the same bounded-cache contract as the shingle
    # relation in minhash_near_dups
    from ffiec_pq_spark.resident import tracked_persist

    reps = tracked_persist(
        grouped.filter(F.col("vid") == F.col("rep"))
        .select("vid", "v", "g", norm(F.col("v")).alias("nrm"))
        .join(asg.withColumnRenamed("id", "vid"), "vid")
    )
    reps.count()
    a = reps.select(
        F.col("vid").alias("id_a"),
        "cell",
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = reps.select(
        F.col("vid").alias("id_b"),
        "cell",
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    # try_divide: zero-norm vectors yield NULL cosine (never dropped),
    # matching the naive pipeline under ANSI mode instead of raising
    cos = F.round(
        F.try_divide(
            dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")
        ),
        6,
    )
    # The within-cell pair join EXPLODES after its exchange: the
    # pre-join sides are a few MB, so AQE's byte-based coalescing packs
    # the whole Σ_cell C(n_cell,2) cosine computation into ONE task
    # (round-15 profile: a single 2.5 s task while 31 cores idled).
    # Salt the join key (guide §2.5): id_a picks one deterministic salt,
    # the b side replicates across all salts, so every (a, b) pair still
    # meets exactly once but the work spreads over cells x salts groups.
    # The a side is REPARTITIONED with an explicit partition count —
    # user-specified counts are exempt from AQE coalescing, which pins
    # the parallelism of the join stage.  n_salt derives from the
    # session's parallelism divided by the cell count (scale-adaptive:
    # a production quantizer has >> cores cells, n_salt collapses to 1
    # and the b-side replication cost vanishes).
    sc = emb.sparkSession.sparkContext
    n_salt = int(
        os.environ.get(
            "FFIEC_PQ_SEMDEDUP_SALTS",
            str(max(1, sc.defaultParallelism // max(1, n_cells or 1)))
            if n_cells
            else "1",
        )
    )
    if n_salt > 1:
        a_s = a.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col("id_a")), F.lit(n_salt)).cast("int"),
        ).repartition(sc.defaultParallelism, F.col("cell"), F.col("_salt"))
        b_s = b.withColumn(
            "_salt",
            F.explode(F.array(*[F.lit(i) for i in range(n_salt)])),
        )
        pair_src = a_s.join(b_s, ["cell", "_salt"])
    else:
        pair_src = a.join(b, "cell")
    cross_dropped = (
        pair_src.filter(F.col("id_a") < F.col("id_b"))
        .select("cell", F.col("id_b").alias("rep"), cos.alias("cos"))
        .filter(F.col("cos") >= tau)
        .select("cell", "rep")
        .distinct()
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("_n_cross"))
    )
    within_dropped = (
        reps.filter((F.col("g") >= 2) & (F.col("nrm") > 0))
        .groupBy("cell")
        .agg(F.sum(F.col("g") - 1).alias("_n_within"))
    )
    sizes = asg.groupBy("cell").agg(F.count(F.lit(1)).alias("n_members"))
    nd = F.coalesce("_n_cross", F.lit(0)) + F.coalesce("_n_within", F.lit(0))
    return (
        sizes.join(cross_dropped, "cell", "left")
        .join(within_dropped, "cell", "left")
        .select(
            "cell",
            "n_members",
            nd.alias("n_dropped"),
            (F.col("n_members") - nd).alias("n_kept"),
        )
    )


def probe_buckets_multiprobe(
    probe: list[float], dim: int, n_planes: int, hamming_radius: int = 1
) -> list[int]:
    """Driver-side: the probe's bucket plus every bucket within the
    given Hamming distance of its signature (multi-probe LSH).  A
    vector whose cosine is high but whose signature differs in a bit or
    two lands in a neighboring bucket — single-bucket probing misses it
    (measured recall on the test embeddings: 0 at radius 0, restored at
    radius 1)."""
    base = 0
    for p in range(n_planes):
        plane = _pseudo_plane(dim, p)
        if sum(a * b for a, b in zip(probe, plane)) > 0:
            base += 2**p
    out = {base}
    if hamming_radius >= 1:
        out |= {base ^ (1 << p) for p in range(n_planes)}
    if hamming_radius >= 2:
        out |= {
            base ^ (1 << p) ^ (1 << q)
            for p in range(n_planes)
            for q in range(p + 1, n_planes)
        }
    return sorted(out)


def ann_topk_lsh(
    df: DataFrame,
    probe: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    hamming_radius: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Multi-probe LSH top-k: score only vectors whose signature is
    within ``hamming_radius`` of the probe's.

    Scan fraction ~ (1 + C(n_planes, <=r)) / 2^n_planes (radius 1 with
    8 planes: 9/256 of the data) — the serving-path tradeoff, with
    ``ann_topk_bruteforce`` as the ground-truth baseline.
    """
    buckets = hyperplane_lsh_buckets(df, dim, n_planes, vec_col, id_col)
    cells = probe_buckets_multiprobe(probe, dim, n_planes, hamming_radius)
    cand = df.join(
        buckets.filter(F.col("bucket").isin(cells)),
        df[id_col] == buckets.id,
        "left_semi",
    )
    return ann_topk_bruteforce(cand, probe, k, vec_col, id_col)
