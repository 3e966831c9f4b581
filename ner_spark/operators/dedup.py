"""Deduplication suite for large-scale training-data pipelines.

The reference only has exact-duplicate elimination (SURVEY.md §2 D1,
reference: src/utils/epg_cleaner.py:61-69); a 100 TB corpus needs the whole
ladder: exact (hash groupBy), near-dup candidates by n-gram Jaccard
(shingle-blocking join with a document-frequency cap on hot shingles),
MinHash+LSH (band-bucket join — the scale path: candidate generation cost
is O(docs x bands), never O(docs^2)), and SimHash (60-bit fingerprint,
hamming-radius candidates with pigeonhole-sound segment blocking).

Everything is pure column expressions (whole-stage codegen, no Python on
the hot path). Hashing comes in two modes: ``xxhash64`` (fastest, JVM
intrinsic) and ``md5`` (bit-identical in DuckDB, so the driver's SQL oracle
can replay the exact same signatures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from .scratch import scratch_persist

HASH_P = 1_000_003  # prime modulus for shingle hashing
SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits a signed 64-bit int


def tokens(col):
    return F.split(F.trim(col), r"\s+")


def explode_ne(col) -> Column:
    """``explode`` for arrays that are provably non-empty.

    Uses ``explode_outer``, which is row-for-row identical to ``explode``
    when the array is never null/empty — but is exempt from Catalyst's
    ``InferFiltersFromGenerate`` rule. That rule synthesizes a
    ``size(arr) > 0`` filter from an inner explode, and predicate pushdown
    then inlines the whole array-building expression into a per-row filter
    BELOW the projection that computes it, so expensive arrays (shingle
    grams, banded hashes) are built twice per row — measured 17x wall on
    contamination_check at sf0.1. Sessions built by :mod:`ner_spark.session`
    exclude the rule outright; this helper keeps hot operators safe under
    sessions we don't configure (e.g. the driver's).

    Only use on arrays guaranteed non-empty (``shingled`` output, fixed-size
    ``F.array(...)`` literals): for a possibly-empty array, explode drops
    the row while this yields a null-element row.
    """
    return F.explode_outer(col)


def shingles(col, n: int = 3):
    """Distinct word n-gram shingles of a text column.

    NB: ``col`` should be a plain column REFERENCE to an already-projected
    token array or text attribute where possible — the gram builder
    references its input 3 times per shingle index, and Catalyst performs
    no CSE across those references, so an inline ``split(...)`` expression
    here re-tokenizes the text ~3*n_shingles times per row (measured 5x
    slowdown at sf0.1). Use :func:`shingled` for the safe two-projection
    form.
    """
    t = tokens(col)
    return _shingles_of(t, n)


def _shingles_of(t, n: int):
    """Gram builder over a token-array column (see caveat in shingles)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(t) >= n, grams).otherwise(F.array(F.concat_ws(" ", t)))
    )


def shingled(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc, sh) with the tokenization materialized in its OWN projection:
    the token split runs once per row and the gram builder reads the
    resulting attribute. CollapseProject will not merge the two projections
    because the token alias is referenced 3*n_shingles times and is not
    cheap — exactly the barrier we want."""
    toks = docs.filter(
        F.col(text_col).isNotNull() & (F.length(F.trim(text_col)) > 0)
    ).select(F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_toks"))
    return toks.select("doc", _shingles_of(F.col("_toks"), n).alias("sh"))


def affine_coeffs(k: int, seed: int = 1234) -> list[tuple[int, int]]:
    """k deterministic affine permutation coefficients (a, b) over Z_P."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, HASH_P), rng.randrange(0, HASH_P)) for _ in range(k)]


def md5_60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint.

    Chosen because DuckDB computes the identical value
    (``('0x' || substr(md5(x), 1, 15))::BIGINT``), which lets the driver's
    SQL oracle replay signature computations bit-for-bit.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via hash-groupBy; returns groups with >1 members."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .groupBy(F.sha2(F.col(text_col), 256).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("members"),
        )
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.1,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard via shingle-blocking join.

    |A ∩ B| from a shingle-equality self-join (only docs sharing >=1
    shingle are ever paired — the blocking step), then
    J = inter / (|A| + |B| - inter).

    ``max_df``: a shingle shared by d documents contributes d^2 join pairs
    on one key — one stop-phrase shingle with df=10^6 means 10^12 pairs on
    a single reducer. With ``max_df`` set, shingles whose document
    frequency exceeds it are dropped *before* the self-join (the hot set is
    tiny, so it broadcasts into an anti-join) and the Jaccard denominators
    are recomputed over the kept shingles — well-defined "df-capped
    Jaccard" semantics, mirrored exactly by the SQL oracle. Stop-phrase
    shingles carry no dedup signal, so at corpus scale the cap loses
    nothing; ``max_df=None`` keeps the exact semantics for small inputs.
    """
    inter = shingle_intersections(docs, n, text_col, id_col, max_df)
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def shingle_intersections(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, n_a, n_b, inter) for every doc pair sharing >=1 kept
    shingle — the blocking self-join both set-overlap measures (Jaccard
    resemblance and directional containment) finish from."""

    sh = shingled(docs, n, text_col, id_col)
    # the posting list feeds the df-count, the anti-join, the n_sh
    # recount, AND both sides of the self-join — six consumers of the
    # same subtree; without a materialization barrier Spark recomputes
    # the tokenize+gram work for each (measured 6x wall at sf0.1).
    # persist(MEMORY_AND_DISK), NOT localCheckpoint: localCheckpoint
    # truncates lineage, so on a real cluster a lost executor makes its
    # blocks unrecoverable and fails the job — persist keeps the lineage
    # and recomputes lost blocks, at the same local cost.
    posting = scratch_persist(
        sh.select("doc", explode_ne("sh").alias("shingle"))
    )
    if max_df is not None:
        hot = (
            posting.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        posting = posting.join(F.broadcast(hot), "shingle", "left_anti")
    n_sh = posting.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    posting = scratch_persist(posting.join(n_sh, "doc"))
    a, b = posting.alias("a"), posting.alias("b")
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )


def containment_pairs(
    docs: DataFrame,
    threshold_pct: int = 50,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Directional set containment C = |A ∩ B| / min(|A|, |B|) — the
    asymmetric near-dup measure (Broder's "containment"): a short document
    quoted whole inside a long one scores C=1.0 while its Jaccard
    resemblance is tiny, so a resemblance-threshold dedup pass never sees
    it. Same df-capped blocking join as ``ngram_jaccard_pairs``; the
    threshold compares in exact integers (inter*100 >= min*pct), float
    enters only in the reported rounded ratio.
    """
    inter = shingle_intersections(docs, n, text_col, id_col, max_df)
    small = F.least(F.col("n_a"), F.col("n_b"))
    return (
        inter.filter(F.col("inter") * 100 >= small * F.lit(threshold_pct))
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            "inter",
            F.round(F.col("inter") / small, 4).alias("containment"),
        )
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    window: int = 3,
    threshold_pct: int = 80,
    key_len: int = 64,
    block_len: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sorted-neighborhood dedup (Hernández & Stolfo, SIGMOD 1995): sort on
    a normalized blocking key, compare each record only with the next
    ``window-1`` records in sort order, verify candidates with exact
    token-set Jaccard. The classic alternative to hash/LSH blocking —
    O(docs * window) comparisons, catches near-dups whose edits are *past*
    the key prefix (where a hash block would split them).

    Scale: the sliding window is a ``lead()`` window PARTITIONED by the
    key's ``block_len``-char prefix — never an unpartitioned global window
    (each block sorts independently; pairs straddling a block boundary are
    the method's documented recall trade, same as its multi-pass mitigation
    in the literature). A pathological block (every doc starting with the
    same 2 chars) concentrates one partition; the standard fix is another
    pass with a different key, not salting, since the window needs true
    sort adjacency. Verification is JVM-side set arithmetic
    (array_intersect on pre-distincted token arrays); the threshold
    compares in integers (inter*100 >= union*pct).
    """
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
        )
    )
    pairs = _snm_candidates(docs, window, key_len, block_len, text_col, id_col, toks)
    return _jaccard_verify(pairs, threshold_pct)


def _jaccard_verify(pairs: DataFrame, threshold_pct: int) -> DataFrame:
    """Token-set Jaccard verifier over (doc_a, doc_b, pa, pb) candidates:
    intersection/union sizes computed map-side (the token arrays never
    cross the distinct's exchange), integer threshold compare."""
    inter = F.size(F.array_intersect("pa", "pb"))
    scored = pairs.select(
        "doc_a",
        "doc_b",
        inter.alias("inter"),
        (F.size("pa") + F.size("pb") - inter).alias("uni"),
    ).distinct()
    return (
        scored.filter(F.col("inter") * 100 >= F.col("uni") * F.lit(threshold_pct))
        .select("doc_a", "doc_b", F.round(F.col("inter") / F.col("uni"), 4).alias("jaccard"))
    )


def sorted_neighborhood_multipass(
    docs: DataFrame,
    window: int = 3,
    threshold_pct: int = 80,
    key_len: int = 64,
    block_len: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multi-pass sorted-neighborhood dedup — the literature's standard fix
    for single-pass SNM's boundary blindness (Hernández & Stolfo run
    several passes with INDEPENDENT keys and union the matches): pass 1
    sorts on the forward-normalized key, pass 2 on its REVERSE, so two
    near-dups that diverge in their opening characters (different forward
    blocks, never compared in pass 1) still land adjacent when their
    endings agree. Candidates from both passes union BEFORE the verifier,
    whose distinct collapses pairs found by both; cost is exactly 2x the
    single pass (two block-partitioned window scans), still O(docs*window)
    comparisons — never all-pairs."""
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
        )
    )
    fwd = _snm_candidates(docs, window, key_len, block_len, text_col, id_col, toks)
    rev_key = F.reverse(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", "")
    )
    rev = _snm_candidates(
        docs, window, key_len, block_len, text_col, id_col, toks, key_expr=rev_key
    )
    return _jaccard_verify(fwd.unionByName(rev), threshold_pct)


def _snm_candidates(
    docs: DataFrame,
    window: int,
    key_len: int,
    block_len: int,
    text_col: str,
    id_col: str,
    payload: Column,
    key_expr: Column | None = None,
) -> DataFrame:
    """Shared sorted-neighborhood candidate generator: (doc_a, doc_b, pa,
    pb) for every pair within ``window-1`` positions in the (skey, doc)
    sort order of each ``block_len``-char key-prefix block. ``payload`` is
    any per-row Column the verifier needs (token set, normalized text);
    ``key_expr`` overrides the default forward-normalized sort key (the
    multi-pass variant passes the reversed key). The lead() window is
    block-partitioned — never global."""
    from pyspark.sql import Window

    norm = (
        key_expr
        if key_expr is not None
        else F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", "")
    )
    keyed = (
        docs.filter(F.col(text_col).isNotNull() & (F.length(F.trim(text_col)) > 0))
        .select(
            F.col(id_col).alias("doc"),
            F.substring(norm, 1, key_len).alias("skey"),
            payload.alias("pay"),
        )
        .filter(F.col("skey") != "")
        .withColumn("blk", F.substring("skey", 1, block_len))
    )
    w = Window.partitionBy("blk").orderBy("skey", "doc")
    neigh = keyed.select(
        "doc",
        "pay",
        *[F.lead("doc", i).over(w).alias(f"_d{i}") for i in range(1, window)],
        *[F.lead("pay", i).over(w).alias(f"_p{i}") for i in range(1, window)],
    )
    parts = [
        neigh.filter(F.col(f"_d{i}").isNotNull()).select(
            F.least("doc", f"_d{i}").alias("doc_a"),
            F.greatest("doc", f"_d{i}").alias("doc_b"),
            F.col("pay").alias("pa"),
            F.col(f"_p{i}").alias("pb"),
        )
        for i in range(1, window)
    ]
    pairs = parts[0]
    for p in parts[1:]:
        pairs = pairs.unionByName(p)
    return pairs


def edit_distance_pairs(
    docs: DataFrame,
    window: int = 3,
    max_dist: int = 16,
    max_chars: int = 512,
    key_len: int = 64,
    block_len: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Levenshtein-verified near-dup pairs over the sorted-neighborhood
    sliding window — the character-level verifier the SNM literature pairs
    with windowed blocking, catching word-internal typo edits that the
    token-set Jaccard verifier rounds away (one char flipped = whole token
    lost to a set measure, but edit distance 1).

    The compared payload is the ASCII-normalized text (lower, non-[a-z0-9]
    runs collapsed to single spaces) truncated to ``max_chars`` — the
    normalization guarantees byte==char semantics everywhere (JVM
    levenshtein counts UTF-16 chars, other engines count bytes; on pure
    ASCII they agree), and the cap bounds the O(len^2) DP per pair. The
    JVM's threshold-pruned levenshtein (3-arg form, Ukkonen band) returns
    -1 past ``max_dist``, so rejected candidates cost O(len*max_dist),
    not O(len^2).
    """
    pay = F.substring(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")),
        1,
        max_chars,
    )
    pairs = _snm_candidates(docs, window, key_len, block_len, text_col, id_col, pay)
    dist = F.levenshtein(F.col("pa"), F.col("pb"), max_dist)
    scored = pairs.select(
        "doc_a", "doc_b", dist.cast("long").alias("dist")
    ).distinct()
    return scored.filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))


def minhash_signatures(
    docs: DataFrame,
    k: int = 32,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """k-permutation MinHash signatures, pure column expressions.

    Permutation j = hash(shingle, j) mod P; signature element = min over
    the doc's shingles. JVM-side and deterministic at any parallelism.
    ``hash_mode="md5"`` uses the DuckDB-replayable 60-bit md5 (slower but
    oracle-checkable); ``"xxhash64"`` is the production fast path.
    """
    # project tokens, then the shingle array, each ONCE (see shingled):
    # referencing raw expressions inside all k permutation expressions
    # would re-tokenize and re-build the n-gram array k times per row (no
    # CSE across sibling expressions) — measured 20x slower on long docs
    with_sh = shingled(docs, n, text_col, id_col)

    if hash_mode == "md5":
        # ONE md5 per shingle (materialized as its own projection), then k
        # affine permutations (a_j*h + b_j) mod P over the reduced hash —
        # 16x fewer md5 evaluations than hashing (shingle, j) pairs, and
        # the integer constants replay verbatim in the SQL oracle. h is
        # reduced mod P first so a_j*h never overflows int64.
        hs = with_sh.select(
            "doc",
            F.transform(
                F.col("sh"), lambda s: F.pmod(md5_60(s), F.lit(HASH_P))
            ).alias("hs"),
        )
        def perm(a: int, b: int):
            # closure (not default args): F.transform treats any 2+-param
            # lambda as (element, array_index) and would shadow a/b
            return F.array_min(
                F.transform(F.col("hs"), lambda h: F.pmod(a * h + b, F.lit(HASH_P)))
            )

        sig = F.array(*[perm(a, b) for a, b in affine_coeffs(k)])
        return hs.select("doc", sig.alias("sig"))

    def perm_min(j: int):
        # NB: the lambda must take exactly ONE argument — a two-arg lambda
        # (e.g. `lambda s, j=j`) is treated by F.transform as
        # (element, array_index) and silently shadows the closure variable
        return F.array_min(
            F.transform(
                F.col("sh"), lambda s: F.pmod(F.xxhash64(s, F.lit(j)), F.lit(HASH_P))
            )
        )

    sig = F.array(*[perm_min(j) for j in range(k)])
    return with_sh.select("doc", sig.alias("sig"))


def _banded_signatures(
    docs: DataFrame,
    k: int,
    bands: int,
    n: int,
    text_col: str,
    id_col: str,
    hash_mode: str,
) -> DataFrame:
    """(doc, band, bucket) rows: the signature split into ``bands`` band
    keys — the LSH index layout shared by the self-join
    (:func:`minhash_lsh_pairs`) and the asymmetric delta-vs-index probe
    (:func:`minhash_incremental_pairs`)."""
    assert k % bands == 0
    r = k // bands
    sigs = minhash_signatures(docs, k, n, text_col, id_col, hash_mode)

    def bucket(bi: int):
        sliced = F.slice("sig", bi * r + 1, r)
        if hash_mode == "md5":
            # string bucket key = the band slice itself (SQL-replayable)
            return F.concat_ws(",", F.transform(sliced, lambda x: x.cast("string")))
        return F.xxhash64(sliced).cast("string")

    return sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(bi).alias("band"), bucket(bi).alias("bucket"))
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join per band.

    Cost is O(docs x bands) for bucketing plus within-bucket pairing — the
    100 TB-safe candidate generator. Pairs are distinct; verify with
    ngram_jaccard on the candidates if exact scores are needed.
    """
    banded = _banded_signatures(docs, k, bands, n, text_col, id_col, hash_mode)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_verified_pairs(
    docs: DataFrame,
    threshold: float = 0.1,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """MinHash-candidates -> exact-Jaccard-verify, composed as ONE operator.

    This is the 100 TB dedup recipe the module's docstrings point at:
    ``ngram_jaccard_pairs``'s direct shingle self-join costs O(sum df^2)
    over shingle document frequencies (even df-capped), while the banded
    LSH candidate join costs O(docs x bands) — so at corpus scale,
    generate candidates with LSH and spend exact-verify work ONLY on
    candidate pairs. Scores and output schema match ``ngram_jaccard_pairs``
    (uncapped) restricted to LSH-caught pairs; with enough bands the two
    outputs coincide above the threshold (recall property, pinned by
    tests/test_dedup_similarity.py).

    Join shape: the posting list is first semi-join-pruned to docs that
    appear in any candidate pair (near-dups are rare at scale, so this
    discards almost everything), then each pair counts its shingle
    intersection via an equi-join on (doc, shingle).
    """

    # `cand` feeds cdocs (both union branches) AND the intersection join —
    # three consumers of the full LSH candidate subtree; `sh` feeds the
    # posting list and the n_sh sizes. Without barriers the candidate
    # generation (the expensive half) recomputes three times per action.
    cand = scratch_persist(
        minhash_lsh_pairs(docs, k, bands, n, text_col, id_col, hash_mode)
    )
    sh = shingled(docs, n, text_col, id_col)
    cdocs = (
        cand.select(F.col("doc_a").alias("doc"))
        .unionByName(cand.select(F.col("doc_b").alias("doc")))
        .distinct()
    )
    sh = scratch_persist(sh.join(cdocs, "doc", "left_semi"))
    posting = sh.select("doc", F.explode("sh").alias("shingle"))
    n_sh = sh.select("doc", F.size("sh").cast("long").alias("n_sh"))
    inter = (
        cand.join(posting.alias("pa"), F.col("doc_a") == F.col("pa.doc"))
        .join(
            posting.alias("pb"),
            (F.col("doc_b") == F.col("pb.doc"))
            & (F.col("pa.shingle") == F.col("pb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = n_sh.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = n_sh.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """60-bit SimHash over word tokens — codegen'd explode + wide sum.

    Per-token 60-bit md5 hash; bit b contributes +1/-1 to counter b;
    fingerprint bit = sign(counter). Round 1 ran this as a pandas UDF with
    blake2b; round 2 as a per-row ``F.aggregate`` lambda over a 60-wide
    accumulator — which executes INTERPRETED (60 x n_tokens expression-tree
    walks per doc). The explode + 60-conditional-sum aggregation here is
    bit-identical (verified exceptAll both ways), stays entirely inside
    whole-stage codegen, and the groupBy's map-side partial aggregation
    means the one shuffle carries a single 60-counter row per doc. md5 is
    bit-identical in DuckDB, so the driver oracle replays it.
    """
    base = docs.filter(
        F.col(text_col).isNotNull() & (F.length(F.trim(text_col)) > 0)
    ).select(F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_toks"))
    tok = base.select("doc", F.explode("_toks").alias("_t")).withColumn(
        "_h", md5_60(F.col("_t"))
    )
    counters = tok.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright("_h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_c{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fp = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        fp = fp + F.when(F.col(f"_c{b}") > 0, F.lit(1 << b)).otherwise(
            F.lit(0)
        ).cast("long")
    return counters.select("doc", fp.alias("simhash"))


def _segment_layout(n_seg: int, bits: int = SIMHASH_BITS) -> list[tuple[int, int]]:
    """(offset, width) for ``n_seg`` disjoint segments covering all bits.

    Widths differ by at most 1 so no segment is empty — an empty (all-zero)
    segment would collide every pair and degenerate to a cross join.
    """
    base, extra = divmod(bits, n_seg)
    assert base >= 1, f"cannot split {bits} bits into {n_seg} non-empty segments"
    widths = [base + 1] * extra + [base] * (n_seg - extra)
    out, off = [], 0
    for w in widths:
        out.append((off, w))
        off += w
    return out


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash near-dup candidates with *sound* segment blocking.

    Blocks = ``max_hamming + 1`` disjoint bit segments: a pair within the
    radius differs in <= max_hamming bits, so by pigeonhole at least one
    segment is identical — candidate recall is 100% at the requested radius
    for ANY radius (round 1 hard-coded 4 blocks, which is only exhaustive
    for hamming <= 3; a radius-10 query silently missed pairs spread over
    all four quarters). Exact hamming verify with bit_count after blocking.
    Wider radii mean narrower segments (coarser buckets, more candidates) —
    the inherent SimHash selectivity/radius trade-off, now explicit.
    """

    # both sides of the self-join consume the fingerprint subtree — persist
    # so the hash + wide aggregation runs once, not twice
    sh = scratch_persist(simhash_fingerprints(docs, text_col, id_col))
    segs = _segment_layout(max_hamming + 1)
    segments = sh.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("q"),
                        F.shiftrightunsigned("simhash", off)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("v"),
                    )
                    for i, (off, w) in enumerate(segs)
                ]
            )
        ).alias("qq"),
    ).select("doc", "simhash", "qq.q", "qq.v")
    a, b = segments.alias("a"), segments.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# packed tie-break key layout: h30 (< 2^30) * 2^32 + (2^32 - 1 - pos).
# The position field must exceed any real document's k-gram count or the
# offset goes negative and borrows into the hash field (silently wrong
# window minima); 2^32 grams ≈ a 4-billion-token document, far above any
# input, and the full key stays < 2^62 (BIGINT-safe in Spark and DuckDB).
WINNOW_HASH_MOD = 1 << 30
WINNOW_POS_BITS = 1 << 32


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al., SIGMOD 2003 —
    the MOSS scheme): hash every k-token gram, then in each sliding window
    of ``w`` consecutive gram hashes select the minimum, taking the
    RIGHTMOST position on ties. Guarantees at least one selected
    fingerprint in every w-gram window while sampling ~2/(w+1) of grams.

    The tie rule is packed into one BIGINT — ``key = h30 * WINNOW_POS_BITS
    + (WINNOW_POS_BITS - 1 - pos)`` with ``h30 < WINNOW_HASH_MOD`` (see the
    constants' comment above for the field-width proof) — so a single
    per-doc window ``min()`` performs min-hash + rightmost-pos in one
    comparison and both engines (and the DuckDB oracle) select identical
    fingerprints. Docs shorter than ``w`` grams select the minimum over
    all their grams (one clipped window).

    Returns distinct ``(doc_id, h30)`` rows (h30 = 30-bit gram hash).
    Per-document window frames only — never a global sort; selection of a
    1e9-doc corpus is an embarrassingly parallel scan + local window.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (
        docs.filter(
            F.col(text_col).isNotNull()
            & (F.length(F.trim(F.col(text_col))) > 0)
        )
        .select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
        .filter(F.size("__toks") >= k)
    )
    kg = base.select(
        "doc_id",
        F.size("__toks").alias("n"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(__toks) - {k} + 1),"
                f" p -> array_join(slice(__toks, p, {k}), ' '))"
            )
        ).alias("pos0", "gram"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        (F.col("n") - k + 1).alias("m"),
        (md5_60(F.col("gram")) % WINNOW_HASH_MOD).alias("h30"),
    )
    keyed = kg.select(
        "doc_id",
        "pos",
        "m",
        (
            F.col("h30") * WINNOW_POS_BITS
            + (WINNOW_POS_BITS - 1 - F.col("pos"))
        ).alias("key"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        keyed.withColumn("wmin", F.min("key").over(win))
        .filter(F.col("pos") <= F.greatest(F.lit(1), F.col("m") - w + 1))
        .select("doc_id", F.expr(f"wmin div {WINNOW_POS_BITS}").alias("h30"))
        .distinct()
    )


def _verify_pair_candidates(
    cand: DataFrame, sets: DataFrame, threshold_pct: int
) -> DataFrame:
    """Exact integer-Jaccard verify of (doc_a, doc_b) candidate pairs
    against collected shingle arrays; shared by the exact prefix-filter
    path and its MinHash degrade path so both emit the same schema
    (doc_a, doc_b, n_a, n_b, inter, jaccard)."""
    sa = sets.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    sized = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size("sh_a").cast("long").alias("n_a"),
            F.size("sh_b").cast("long").alias("n_b"),
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("inter"),
        )
    )
    uni = F.col("n_a") + F.col("n_b") - F.col("inter")
    return sized.filter(F.col("inter") * 100 >= uni * threshold_pct).select(
        "doc_a",
        "doc_b",
        "n_a",
        "n_b",
        "inter",
        F.round(F.col("inter") / uni, 4).alias("jaccard"),
    )


class CandidateBudgetExceeded(RuntimeError):
    """Raised by prefix_filter_pairs(on_exceed='error') when the pre-flight
    candidate estimate exceeds max_candidates."""


def prefix_filter_pairs(
    docs: DataFrame,
    threshold_pct: int = 70,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_candidates: int | None = None,
    on_exceed: str = "degrade",
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (AllPairs /
    PPJoin, Bayardo et al. WWW'07): provably every pair with shingle
    Jaccard >= t, with the candidate join restricted to each doc's
    (n - ceil(t*n) + 1) globally-RAREST shingles.

    Why it is lossless: if J(A,B) >= t then |A ∩ B| >= t/(1+t)*(|A|+|B|)
    >= ceil(t*|A|); removing any n_A - ceil(t*n_A) + 1 elements of A must
    therefore leave at least one shared element — so under ANY global
    total order the first (n_A - ceil(t*n_A) + 1) elements of A contain a
    shared shingle, and symmetrically for B. Ordering rare-first makes
    that prefix the cheapest possible join key set.

    Scale shape: posting -> df join (shuffle on shingle, REUSED by the
    candidate self-join), one per-doc window sort for the ranking, prefix
    self-join volume sum(df_prefix^2) over rare shingles only (a
    stop-shingle is only in a doc's prefix if the doc consists almost
    entirely of stop-shingles), then candidate-pair verify against the
    collected shingle arrays — integer Jaccard, one rounded double at the
    edge. Unlike ngram_jaccard_pairs (df-capped, drops hot-shingle-only
    pairs by design) this returns the EXACT threshold join output.

    Candidate-budget guard (round-5 directive 3): exactness has an honest
    linear-per-doc cost — measured 10.2x wall at 10x docs
    (BENCH/sf1_stress_r04.json) where every sibling is sublinear — so at
    100x this is the first dedup query to die, and nothing used to guard
    the knobs. With ``max_candidates`` set, a pre-flight audit computes
    the candidate-pair bound sum(c*(c-1)/2) over per-shingle prefix
    posting counts (one map-side-combinable aggregate + a 1-row collect,
    the ``kg_linking_skew_audit`` pattern). Over budget, ``on_exceed``
    picks the failure mode: ``"degrade"`` switches candidate generation
    to the banded MinHash-LSH path (O(docs x bands), k=32/bands=16 —
    ~1.0 recall at J>=0.7) with the SAME exact-verify step and output
    schema, trading provable completeness for survival; ``"error"``
    raises :class:`CandidateBudgetExceeded` with the estimate so a
    scheduler can re-shard or raise the budget deliberately.
    """
    from pyspark.sql import Window

    from .scratch import scratch_persist

    # four consumers read the shingle sets (posting x2 via ranked, sa, sb)
    # and `shingled` output is provably non-empty — barrier + explode_ne,
    # the same shield every sibling multi-consumer operator carries
    sets = scratch_persist(shingled(docs, n, text_col, id_col))
    posting = sets.select("doc", explode_ne(F.col("sh")).alias("shingle"))
    dfq = posting.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc").orderBy("df", "shingle")
    wn = Window.partitionBy("doc")
    ranked = (
        posting.join(dfq, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_sh", F.count(F.lit(1)).over(wn))
    )
    prefix_len = (
        F.col("n_sh")
        - ((F.lit(threshold_pct) * F.col("n_sh") + 99) / 100).cast("long")
        + 1
    )
    prefix = ranked.filter(F.col("rn") <= prefix_len).select("doc", "shingle")
    if max_candidates is not None:
        # the estimate and the candidate join both consume the ranked
        # prefix (a df-join + two windows) — barrier it so the pre-flight
        # does not double that work when the budget holds
        prefix = scratch_persist(prefix)
        est_row = (
            prefix.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("est"))
            .collect()[0]
        )
        est = int(est_row["est"] or 0)
        if est > max_candidates:
            if on_exceed == "error":
                raise CandidateBudgetExceeded(
                    f"prefix-filter candidate estimate {est} exceeds budget "
                    f"{max_candidates}; re-shard the corpus, raise the "
                    f"budget, or accept the MinHash degrade path"
                )
            cand = minhash_lsh_pairs(
                docs, k=32, bands=16, n=n, text_col=text_col, id_col=id_col
            )
            return _verify_pair_candidates(cand, sets, threshold_pct)
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    return _verify_pair_candidates(cand, sets, threshold_pct)


def segment_firstseen(docs: DataFrame, width: int = 16) -> DataFrame:
    """Sub-document dedup at fixed ``width``-token segment granularity.

    Splits each document's token stream into consecutive segments of
    ``width`` tokens (the last segment may be shorter), then keeps only
    the GLOBALLY first occurrence of each distinct segment text — the
    survivor is pinned by min(struct(doc_id, seg_idx)), the same
    sentinel struct-min pattern as the correction re-collapse
    (operators/corrections.py). The corpus-wide occurrence count rides
    along.

    Scale shape: segment construction is a map-side explode (no lambda
    HOF in an aggregate — the sequence+explode form stays in codegen);
    the only shuffle keys on segment text, and both the struct-min and
    the count are map-side combinable, so a hot segment (the exact
    thing this operator collapses) partial-aggregates before the
    exchange. The aggregate row IS the survivor — no join-back pass.
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.filter(
        F.col("text").isNotNull() & (F.length(F.trim(F.col("text"))) > 0)
    ).select("doc_id", toks.alias("toks"))
    idx = base.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0), ((F.size("toks") - 1) / width).cast("int")
            )
        ).alias("seg_idx"),
    )
    segs = idx.select(
        "doc_id",
        F.col("seg_idx").cast("long").alias("seg_idx"),
        F.array_join(
            F.slice(F.col("toks"), F.col("seg_idx") * width + 1, F.lit(width)),
            " ",
        ).alias("seg"),
    )
    g = segs.groupBy("seg").agg(
        F.min(F.struct("doc_id", "seg_idx")).alias("first_occ"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    return g.select(
        F.col("first_occ.doc_id").alias("doc_id"),
        F.col("first_occ.seg_idx").alias("seg_idx"),
        "seg",
        "n_occ",
    )


def minhash_incremental_pairs(
    docs: DataFrame,
    delta_mod: int = 5,
    threshold: float = 0.1,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Incremental dedup: probe a NEW ingest batch against the existing
    corpus's MinHash index — the daily-crawl flow, where re-running the
    full self-join over 10^12 existing docs per ingest is off the table.

    The corpus splits deterministically into ``delta`` (md5 bucket
    ``% delta_mod == 0``, modeling the new batch) and ``index`` (the
    standing corpus). Both sides band their signatures with the SAME
    layout (:func:`_banded_signatures`); candidates come from the
    ASYMMETRIC band-bucket join delta -> index (no delta-delta or
    index-index pairs — intra-batch dups are the self-join's job), then
    exact n-gram Jaccard is verified only on candidates, exactly as
    :func:`minhash_verified_pairs`.

    Scale shape: at production the index side is a MATERIALIZED
    (band, bucket, doc) table partitioned by band — the probe is then
    |delta| x bands lookups against a bucketed layout with no shuffle on
    the index side at all; here both sides derive from one table so the
    banding shows up twice in the plan. Candidate volume is
    O(|delta| x bands x bucket-width), never O(|corpus|^2).
    """

    is_delta = (
        F.pmod(md5_60(F.concat(F.lit("inc:"), F.col("doc").cast("string"))), F.lit(delta_mod))
        == 0
    )
    banded = _banded_signatures(docs, k, bands, n, text_col, id_col, hash_mode).select(
        "doc", "band", "bucket", is_delta.alias("is_delta")
    )
    d, i = banded.filter("is_delta").alias("d"), banded.filter("NOT is_delta").alias("i")
    cand = (
        d.join(
            i,
            (F.col("d.band") == F.col("i.band"))
            & (F.col("d.bucket") == F.col("i.bucket")),
        )
        .select(F.col("d.doc").alias("doc_new"), F.col("i.doc").alias("doc_idx"))
        .distinct()
    )
    cand = scratch_persist(cand)
    sh = shingled(docs, n, text_col, id_col)
    cdocs = (
        cand.select(F.col("doc_new").alias("doc"))
        .unionByName(cand.select(F.col("doc_idx").alias("doc")))
        .distinct()
    )
    sh = scratch_persist(sh.join(cdocs, "doc", "left_semi"))
    posting = sh.select("doc", F.explode("sh").alias("shingle"))
    n_sh = sh.select("doc", F.size("sh").cast("long").alias("n_sh"))
    inter = (
        cand.join(posting.alias("pa"), F.col("doc_new") == F.col("pa.doc"))
        .join(
            posting.alias("pb"),
            (F.col("doc_idx") == F.col("pb.doc"))
            & (F.col("pa.shingle") == F.col("pb.shingle")),
        )
        .groupBy("doc_new", "doc_idx")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = n_sh.select(F.col("doc").alias("doc_new"), F.col("n_sh").alias("n_a"))
    nb = n_sh.select(F.col("doc").alias("doc_idx"), F.col("n_sh").alias("n_b"))
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.join(na, "doc_new")
        .join(nb, "doc_idx")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_new", "doc_idx", "jaccard")
    )
