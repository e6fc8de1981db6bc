"""Text-analysis operators over a documents table: per-document
features (token counts, quality ratios, language guess, fingerprint)
and per-language corpus statistics.

Everything is built-in column expressions (whole-stage codegen) with
exact ANSI-SQL equivalents — the DuckDB oracle runs the same logic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from .persists import tracked_persist

from ..functions.textfns import (
    bpe_ish_token_count,
    fingerprint,
    normalize_text,
    punct_count,
    stopword_count,
    token_count,
    tokens,
)

# Marker words per language, fixed precedence for argmax ties.  A real
# language-ID model uses char-n-gram profiles; this is the same
# *operator shape* (deterministic scoring + argmax) with a toy model,
# which keeps it SQL-oracle-checkable.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "de": ("der", "und", "die"),
    "es": ("el", "y", "de"),
    "fr": ("le", "et", "la"),
}
_PRECEDENCE = ("en", "de", "es", "fr")

def _lang_score(c: Column, lang: str) -> Column:
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    s = F.lit(0)
    for m in LANG_MARKERS[lang]:
        s = s + F.when(padded.contains(f" {m} "), 1).otherwise(0)
    return s

def lang_guess(c: Column) -> Column:
    """Deterministic marker-count argmax with fixed precedence;
    'und' (undetermined) when no marker hits."""
    scores = {lang: _lang_score(c, lang) for lang in _PRECEDENCE}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # Build the CASE from lowest precedence up so higher precedence wins ties.
    for lang in reversed(_PRECEDENCE):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr

def doc_features(
    documents: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document feature row: counts, ratios, quality score,
    language guess, fingerprint.

    quality_score is a fixed linear blend (bounded to [0,1]):
    length term (saturating at 500 chars) + stopword presence -
    punctuation excess.  The exact formula matters less than it being
    deterministic, monotone in the obvious directions, and cheap.

    All three emitted ratios are FIXED-POINT: computed as integer
    parts-per-million with floor division over the exact integer
    counts, then divided by 1e6 at the display boundary.  Floating
    blends rounded to N digits sit one ULP from a decimal half for
    some inputs (measured at sf0.1: a doc with sr = 7/64 put the
    quality blend exactly on 0.7250625, where Spark's and DuckDB's
    round-to-6 disagree); integer ppm makes every value engine-exact
    by construction — the pagerank/sketches idiom applied to ratios.
    """
    t = F.col(text_col)
    counts = documents.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars_obs"),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subtokens"),
        punct_count(t).alias("_np"),
        stopword_count(t).alias("_ns"),
        lang_guess(t).alias("lang_guess"),
        fingerprint(t).alias("fp"),
    )
    pr_ppm = (
        "CASE WHEN n_chars_obs = 0 THEN 0 "
        "ELSE (_np * 1000000) div n_chars_obs END"
    )
    sr_ppm = (
        "CASE WHEN n_tokens = 0 THEN 0 ELSE (_ns * 1000000) div n_tokens END"
    )
    # Blend terms in ppm: 0.5*min(chars/500,1) + 0.3*min(5*sr,1)
    # + 0.2*(1 - min(10*pr,1)), every step integer.
    quality_ppm = (
        "least(1000000, "
        " least(n_chars_obs, 500) * 1000"
        " + (CASE WHEN n_tokens = 0 THEN 0"
        "    ELSE least((_ns * 5000000) div n_tokens, 1000000) END) * 3 div 10"
        " + (1000000 - CASE WHEN n_chars_obs = 0 THEN 0"
        "    ELSE least((_np * 10000000) div n_chars_obs, 1000000) END) * 2 div 10"
        ")"
    )
    return counts.select(
        F.col(id_col),
        "n_chars_obs",
        "n_tokens",
        "n_subtokens",
        (F.expr(pr_ppm) / F.lit(1000000.0)).alias("punct_ratio"),
        (F.expr(sr_ppm) / F.lit(1000000.0)).alias("stopword_ratio"),
        (F.expr(quality_ppm) / F.lit(1000000.0)).alias("quality_score"),
        "lang_guess",
        "fp",
    )

def repetition_features(
    documents: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals (the Gopher/MassiveText-style
    quality filters, Rae et al. 2021 §A1.1, adapted to token level for
    single-line documents): fraction of tokens that are repeats of an
    earlier token, and the share of all word-bigrams taken by the
    single most frequent bigram.  High values flag boilerplate,
    keyword-stuffing, and degenerate generations.

    Returns ``(doc_id, n_tokens, dup_token_frac, top_bigram_frac)``,
    ratios rounded to 6 places (exact SQL oracle equality).

    Scale: tokens are exploded once and feed two partial-aggregated
    groupBys keyed by doc_id (+token / +bigram) — shuffle rows are
    token-sized, never full documents; the bigram window is partitioned
    per document (parallel).  No Python, no HOF lambdas in the hot path
    (window-LEAD bigrams, same idiom as dedup.ngram_jaccard_pairs).
    """
    from pyspark.sql.window import Window

    from ..functions.textfns import normalize_text

    base = documents.select(
        F.col(id_col).alias("doc_id"), normalize_text(F.col(text_col)).alias("norm")
    ).where(F.col("norm") != "")
    toks = base.select(
        "doc_id", F.posexplode(F.split(F.col("norm"), " ")).alias("pos", "tok")
    )
    per_tok = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    tok_stats = per_tok.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        (1.0 - F.count("*") / F.sum("c")).alias("_dup_frac"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        toks.withColumn("nxt", F.lead("tok").over(w))
        .where(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "nxt").alias("bg"))
    )
    bg_stats = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c") / F.sum("c")).alias("_top_bg_frac"))
    )
    return (
        tok_stats.join(bg_stats, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            F.round("_dup_frac", 6).alias("dup_token_frac"),
            F.round(F.coalesce("_top_bg_frac", F.lit(0.0)), 6).alias("top_bigram_frac"),
        )
    )


def tfidf_topk(
    documents: DataFrame,
    *,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k characteristic terms by tf-idf.

    The idf here is the raw inverse document frequency (Sparck Jones'
    original non-log variant): ``score = tf / df``.  The log-damped
    ``tf * ln(N/df)`` orders (tf, df) pairs differently in general but
    requires a transcendental whose last-ulp behavior differs between
    engines; the division form is a single IEEE-754 division, which
    every engine rounds identically — so the ranking, not just the
    rounded score, is value-oracle-checkable.  Swapping in a log idf
    is a one-line change where cross-engine hash equality isn't needed.

    Returns ``(doc_id, term, tf, df, score, rnk)``, ``rnk <= k``,
    ranked by (score desc, term asc) — fully deterministic.

    Scale: tokens explode once; tf is a map-side-combined groupBy on
    (doc, term); df aggregates the tf table (one row per (doc, term),
    already much smaller than the token stream) keyed by term; the
    tf⋈df join is keyed on term (AQE handles the stopword-key skew);
    the top-k window partitions by doc_id — embarrassingly parallel,
    no global sort anywhere.
    """
    from pyspark.sql.window import Window

    from ..functions.textfns import normalize_text

    base = documents.select(
        F.col(id_col).alias("doc_id"), normalize_text(F.col(text_col)).alias("norm")
    ).where(F.col("norm") != "")
    tf = (
        base.select("doc_id", F.explode(F.split("norm", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored = tf.join(df, "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round("score", 6).alias("score"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def collocations(
    documents: DataFrame,
    *,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level collocation extraction: the top-k word bigrams by
    PMI lift ``p(xy) / (p(x) * p(y))`` (the exponential of pointwise
    mutual information — same ranking as PMI since exp is monotone,
    but computed purely from integer counts and IEEE divisions, so the
    exact value reproduces in ANSI SQL).  ``min_count`` suppresses the
    unstable low-frequency tail, the standard PMI practice.

    Returns ``(w1, w2, c_pair, c_w1, c_w2, lift)``, the top-k rows by
    (lift desc, w1, w2).

    Scale: bigrams come from one posexplode + a per-document window
    LEAD (no interpreted HOFs); unigram and bigram counts are map-side
    combined groupBys; the two count joins are keyed on single words;
    the final top-k is ``orderBy().limit(k)`` =
    ``TakeOrderedAndProject`` — per-partition partial top-k, no global
    sort materialization.
    """
    from pyspark.sql.window import Window

    from ..functions.textfns import normalize_text

    base = documents.select(
        F.col(id_col).alias("doc_id"), normalize_text(F.col(text_col)).alias("norm")
    ).where(F.col("norm") != "")
    toks = base.select(
        "doc_id", F.posexplode(F.split("norm", " ")).alias("pos", "tok")
    )
    uni = toks.groupBy(F.col("tok").alias("w")).agg(
        F.count("*").cast("long").alias("c_w")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        toks.withColumn("nxt", F.lead("tok").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy(F.col("tok").alias("w1"), F.col("nxt").alias("w2"))
        .agg(F.count("*").cast("long").alias("c_pair"))
        .where(F.col("c_pair") >= min_count)
    )
    n_uni = uni.agg(F.sum("c_w").cast("double").alias("n_uni"))
    n_bi = bigrams.agg(F.sum("c_pair").cast("double").alias("n_bi"))
    scored = (
        bigrams.join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c_w", "c_w1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c_w", "c_w2"), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .withColumn(
            "lift",
            (F.col("c_pair").cast("double") / F.col("n_bi"))
            / (
                (F.col("c_w1").cast("double") / F.col("n_uni"))
                * (F.col("c_w2").cast("double") / F.col("n_uni"))
            ),
        )
    )
    return (
        scored.orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
        .limit(k)
        .select(
            "w1",
            "w2",
            "c_pair",
            "c_w1",
            "c_w2",
            F.round("lift", 6).alias("lift"),
        )
    )


def corpus_stats(
    documents: DataFrame, *, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Per-language corpus rollup: doc count, char/token totals and
    means.  One partial-aggregated shuffle on the (low-cardinality)
    language key."""
    t = F.col(text_col)
    return (
        documents.groupBy(F.col(lang_col).alias("lang"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.length(t)).cast("long").alias("total_chars"),
            F.sum(token_count(t)).cast("long").alias("total_tokens"),
            F.round(F.avg(F.length(t)), 4).alias("avg_chars"),
            F.round(F.avg(token_count(t)), 4).alias("avg_tokens"),
        )
    )


def chunk_documents(
    documents: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document's token sequence into fixed-size windows
    with overlap — sequence preparation for training/embedding
    pipelines (chunk_size tokens per example, ``chunk_size - stride``
    tokens of overlap between consecutive chunks).

    Returns ``(doc_id, chunk_no, start_tok, n_tokens, chunk_md5)``
    where ``chunk_md5`` hashes the space-joined chunk tokens (a
    value-exact identity for the chunk without carrying its text).
    Every document yields at least one chunk (possibly empty for empty
    text); the last chunk may be shorter than ``chunk_size``.

    Scale: entirely narrow — tokenize, compute the chunk count
    arithmetically, explode a ``sequence`` of chunk indices, and
    ``slice`` the staged token array.  No shuffle, no window, no
    Python; row growth is ~n_tokens/stride per document, each row
    carrying only ids and a hash.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = documents.select(
        F.col(id_col), tokens(normalize_text(F.col(text_col))).alias("t")
    )
    n = F.size("t")
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.ceil((n - chunk_size) / F.lit(float(stride))).cast("int") + 1
    )
    staged = toks.select(
        id_col,
        "t",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_no"),
    )
    chunk = F.slice(F.col("t"), F.col("chunk_no") * stride + 1, chunk_size)
    return staged.select(
        id_col,
        "chunk_no",
        (F.col("chunk_no") * stride).alias("start_tok"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


# PII patterns kept to the regex subset Java's engine and RE2-style
# engines (DuckDB) evaluate identically — character classes, bounded
# quantifiers, \b anchors; no lookaround, no backrefs — so redaction is
# byte-reproducible in ANSI SQL for the value oracle.
PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b"


def redact_pii(
    documents: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-prep PII scrubbing: replace emails, IPv4 addresses, and
    phone numbers with typed placeholders, counting each category —
    the standard redaction pass a training pipeline runs before text
    ships to tokenization.

    Redaction order is fixed (email, then ip, then phone) so the
    output is deterministic; counts are taken on the ORIGINAL text.
    Returns the input columns plus ``(clean_text, n_emails, n_ips,
    n_phones)``.

    Scale: pure scan projection — three JVM regexp_replace passes and
    three regexp_count, zero shuffles, whole-stage-codegen inside the
    scan stage.  Regex-based scrubbing is a baseline, not an NER
    system: it catches format-shaped PII only (the usual first pass;
    model-based detectors slot in as a Pandas-UDF stage downstream).
    """
    t = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return documents.select(
        "*",
        clean.alias("clean_text"),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
    )


def rare_bigram_rate(
    documents: DataFrame,
    *,
    rare_max: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frequency-based quality signal: per document, the fraction of
    its word bigrams that are RARE in the corpus (corpus count <=
    ``rare_max``) — high rates flag gibberish, OCR noise, and boiler-
    plate-free junk the way perplexity filtering does, but from pure
    integer counts (no language model, no floats beyond the final
    rounded ratio), so the value oracle is exact.

    Returns ``(doc_id, n_bigrams, n_rare, rare_pct)`` for every
    document with at least one bigram.

    Scale: the corpus bigram table is one map-side-combined groupBy of
    the posexplode+LEAD bigram stream (the ``collocations`` plan); the
    count join back to per-doc bigrams is keyed on the bigram pair —
    at 100 TB swap the join key for a 64-bit digest of (w1, w2) so the
    shuffle carries 8-byte keys (the ``substring_overlap_pairs``
    posture); the per-doc aggregation is map-side combined.
    """
    from pyspark.sql.window import Window

    from ..functions.textfns import normalize_text

    base = documents.select(
        F.col(id_col).alias("doc_id"), normalize_text(F.col(text_col)).alias("norm")
    ).where(F.col("norm") != "")
    toks = base.select(
        "doc_id", F.posexplode(F.split("norm", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    doc_bi = (
        toks.withColumn("nxt", F.lead("tok").over(w))
        .where(F.col("nxt").isNotNull())
        .select("doc_id", F.col("tok").alias("w1"), F.col("nxt").alias("w2"))
    )
    corpus = doc_bi.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c_pair"))
    return (
        doc_bi.join(corpus, on=["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("c_pair") <= rare_max, 1).otherwise(0))
            .cast("long")
            .alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_rare",
            F.round(F.col("n_rare") / F.col("n_bigrams"), 4).alias("rare_pct"),
        )
    )


def pack_sequences(
    documents: DataFrame,
    *,
    budget: int = 256,
    stream_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-sequence packing, concat-then-chunk regime: within
    each packing stream, documents are laid end to end in ``id``
    order and cut into fixed ``budget``-token packs (documents may
    span pack boundaries — the GPT-style pretraining packing, the
    complement of ``chunk_documents``'s per-document windows).
    Returns ``(stream, doc_id, n_tokens, start_tok, pack_id,
    pack_offset)`` where ``start_tok`` is the document's position in
    the stream's token tape, ``pack_id = start_tok div budget`` and
    ``pack_offset = start_tok % budget``.

    All integer arithmetic over a running token sum — deterministic
    and engine-exact.

    Scale: ONE window shuffle partitioned on the stream column; each
    stream's running sum is a sequential scan of its own partition
    (packing is inherently sequential per stream — parallelism comes
    from the number of streams: shard by (source, date, lang) in
    production).  For a single giant stream, the bucketed two-pass
    rank pattern (``dispatch.schedule_requests``: per-bucket window +
    broadcast per-bucket offsets) applies verbatim to the running
    token sum.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = token_count(F.col(text_col))
    tape = documents.select(
        F.col(stream_col).alias("stream"),
        F.col(id_col),
        n_tok.alias("n_tokens"),
        (F.sum(n_tok).over(w) - n_tok).alias("start_tok"),
    )
    b = F.lit(int(budget)).cast("long")
    return tape.select(
        "stream",
        id_col,
        "n_tokens",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.expr(f"start_tok div {int(budget)}").cast("long").alias("pack_id"),
        (F.col("start_tok") % b).cast("long").alias("pack_offset"),
    )


def bm25_topk(
    documents: DataFrame,
    query_terms: tuple = ("vector", "join", "stream"),
    k: int = 15,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 document retrieval for one term query, engine-portable —
    ``(doc_id, score, rank)``, top-k by (score desc, doc_id).

    The classic BM25 constants k1=1.2, b=0.75 are used, but the whole
    per-term weight is algebraically cleared of fractions first:

        tf_part = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
                = 44*tf*T / (20*tf*T + 6*T + 18*dl*N)     [avgdl = T/N]

    with tf, dl (doc length), T (corpus tokens), N (docs) all BIGINT —
    so each term's weight is ONE IEEE division of exact integers, and
    the idf factor is the raw rational (2N - 2df + 1)/(2df + 1) (the
    log is monotone; dropping it keeps the value reproducible in ANSI
    SQL without trusting two libms to round ln identically).  The
    query's term scores are then summed in FIXED left-to-right order
    as an explicit expression — never a float SUM over an unordered
    group — so the double result is bit-identical across engines,
    partitionings, and runs.

    Scale notes: one token explode + one (doc, term)-combined groupBy
    produce per-doc length and per-query-term tf via CONDITIONAL
    aggregation (no per-term scan, no pivot discovery); the corpus
    stats (N, T, df per term) are a one-row aggregate OF THAT table,
    cross-broadcast back; top-k is orderBy().limit(k) =
    TakeOrderedAndProject.  Query terms are a compile-time constant
    (the serving path scores one query at a time), so the score is
    pure whole-stage-codegen arithmetic.
    """
    from ..functions.textfns import normalize_text

    terms = [str(t) for t in query_terms]
    base = documents.select(
        F.col(id_col).alias("doc_id"),
        normalize_text(F.col(text_col)).alias("norm"),
    ).where(F.col("norm") != "")
    toks = base.select("doc_id", F.explode(F.split("norm", " ")).alias("term"))
    per_doc = toks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("n_toks"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    joined = per_doc.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf, df = F.col(f"tf_{i}"), F.col(f"df_{i}")
        n, t_tot, dl = F.col("n_docs"), F.col("n_toks"), F.col("dl")
        idf = (2 * n - 2 * df + 1) / (2 * df + 1)
        tf_part = F.when(
            tf > 0,
            (44 * tf * t_tot) / (20 * tf * t_tot + 6 * t_tot + 18 * dl * n),
        ).otherwise(F.lit(0.0))
        s_i = idf * tf_part
        score = s_i if score is None else score + s_i
    scored = joined.select(
        "doc_id", F.round(score, 6).alias("score")
    ).where(F.col("score") > 0)
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def similar_docs_jaccard(
    documents: DataFrame,
    query_doc_id: int,
    k: int = 10,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_prune_pct: int = 20,
) -> DataFrame:
    """Similar-document retrieval: exact token-set Jaccard of every
    document against ONE query document, blocked by an inverted
    index — the "find me more like this" lookup a curation pipeline
    runs when a curator stars an exemplar.

    The vocabulary is pruned FIRST: tokens whose document frequency
    exceeds ``df_prune_pct``% of the corpus are dropped everywhere
    (stopwords explode the candidate set and carry no discrimination
    — the standard max-df cut), and the Jaccard is computed over the
    PRUNED token sets consistently, so the score is a well-defined
    content-token Jaccard the SQL oracle replays exactly.  The prune
    predicate is cross-multiplied integers (df * 100 <= pct * n_docs)
    — no float boundary.

    Candidates are docs sharing >= 1 surviving token with the query
    (inverted-index semi-block: the index join touches only the
    query's token postings, never all pairs); the query's token set
    rides a broadcast.  Scores are integer ppm (inter * 1e6 DIV
    union) — engine-exact.  Returns ``(doc_id, n_shared, jac_ppm,
    rank)``, rank <= k by (jac_ppm desc, doc_id), query excluded.

    Scale posture: one token explode + two map-side-combined
    aggregations build the pruned index; the candidate join is keyed
    on the query's tokens only (bounded by one document's vocabulary);
    top-k is TakeOrderedAndProject.  At 100 TB the df table is the
    reusable corpus artifact (shared with tf-idf), and per-query cost
    is proportional to the query's posting lists — the inverted-index
    contract.
    """
    from ..functions.textfns import normalize_text

    base = documents.select(
        F.col(id_col).alias("doc_id"),
        normalize_text(F.col(text_col)).alias("norm"),
    ).where(F.col("norm") != "")
    # Persist the distinct token table (read by the df aggregation AND
    # the pruned-index build) and the pruned index itself (read three
    # times: sizes, the query's token set, and the candidate join) —
    # without the persists the tokenize scan re-runs once per
    # consumer.  ContextCleaner reclamation contract as minhash_dedup.
    toks = base.select(
        "doc_id", F.explode(F.split("norm", " ")).alias("tok")
    ).distinct().transform(tracked_persist)
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = base.agg(F.count("*").alias("n_docs"))
    kept = (
        toks.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("df") * 100 <= F.lit(int(df_prune_pct)) * F.col("n_docs"))
        .select("doc_id", "tok")
        .transform(tracked_persist)
    )
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("sz"))
    qtoks = kept.where(F.col("doc_id") == int(query_doc_id)).select(
        F.col("tok").alias("qtok")
    )
    qsize = qtoks.agg(F.count("*").alias("qsz"))
    inter = (
        kept.where(F.col("doc_id") != int(query_doc_id))
        .join(F.broadcast(qtoks), F.col("tok") == F.col("qtok"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("inter"))
    )
    scored = (
        inter.join(sizes, "doc_id")
        .crossJoin(F.broadcast(qsize))
        .select(
            "doc_id",
            F.col("inter").cast("long").alias("n_shared"),
            F.expr(
                "CAST((inter * 1000000) DIV (sz + qsz - inter) AS LONG)"
            ).alias("jac_ppm"),
        )
    )
    from pyspark.sql.window import Window

    top = scored.orderBy(F.col("jac_ppm").desc(), F.col("doc_id")).limit(int(k))
    w = Window.orderBy(F.col("jac_ppm").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def boilerplate_prefixes(
    documents: DataFrame,
    *,
    n_tokens: int = 8,
    k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate-template mining: the top-``k`` most common leading
    ``n_tokens``-token prefixes of normalized text — header/footer
    templates, cookie banners, and licence blurbs surface here before
    a cleaning pass strips them.

    Scale posture: ONE projection builds the prefix key (split +
    slice + join, all codegen), ONE map-side-combined groupBy counts
    it, and the top-k is TakeOrderedAndProject — the shuffle carries
    (prefix, partial count), never document text.

    Returns ``(prefix, n_docs, rank)``, rank by (n_docs desc, prefix).
    """
    from ..functions.textfns import normalize_text
    from pyspark.sql.window import Window

    pref = (
        documents.select(normalize_text(F.col(text_col)).alias("norm"))
        .where(F.col("norm") != "")
        .select(
            F.array_join(
                F.slice(F.split("norm", " "), 1, int(n_tokens)), " "
            ).alias("prefix")
        )
    )
    counts = pref.groupBy("prefix").agg(F.count("*").cast("long").alias("n_docs"))
    top = counts.orderBy(F.col("n_docs").desc(), F.col("prefix")).limit(int(k))
    w = Window.orderBy(F.col("n_docs").desc(), F.col("prefix"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def token_length_histogram(
    documents: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Sequence-length planning histogram: per ``group_col``, document
    counts and token totals in power-of-two token-count buckets — the
    table a packing/batching stage reads to size context windows.

    The bucket is the largest power of two <= token count, computed
    with the HDR idiom (bit length via ``length(bin(c))``, never a
    float log2) so the identical integer expression runs in ANSI SQL.

    Scale posture: one codegen projection + one map-side-combined
    groupBy over (group, bucket) — output cardinality is
    ``n_groups * log2(max_len)``, driver-safe at any corpus size.

    Returns ``(group, bucket, n_docs, total_tokens)``.
    """
    from ..functions.textfns import token_count

    n = token_count(F.col(text_col))
    e = (F.length(F.bin(n)) - 1).cast("int")
    bucket = (
        F.when(n <= 0, F.lit(0))
        .otherwise(F.pow(F.lit(2.0), e.cast("double")).cast("long"))
        .alias("bucket")
    )
    return (
        documents.select(F.col(group_col).alias("group"), bucket, n.alias("n_tok"))
        .groupBy("group", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
    )


def lang_confusion(
    documents: DataFrame, *, text_col: str = "text", label_col: str = "lang"
) -> DataFrame:
    """Language-ID evaluation: the confusion matrix of the
    deterministic marker-count guess (``lang_guess``) against the
    labeled language — the accuracy readout a router/filter stage
    publishes before trusting the classifier on unlabeled data.
    Languages outside the marker table (e.g. zh) SHOULD land in a
    wrong-or-'und' row; that visibility is the point.

    Scale posture: one codegen projection (fixed marker containment
    checks, no tokenization) + one map-side-combined groupBy over at
    most ``n_langs * (n_langs + 1)`` cells.

    Returns ``(lang, lang_guess, n_docs)``.
    """
    return (
        documents.select(
            F.col(label_col).alias("lang"),
            lang_guess(F.col(text_col)).alias("lang_guess"),
        )
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def bpe_train(
    documents: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 5,
    max_word_len: int = 30,
) -> DataFrame:
    """Distributed BPE merge training (round 9) — the canonical
    LLM-tokenizer pipeline step: learn the first ``n_merges`` byte-pair
    merges from the corpus by iterating (count adjacent symbol pairs
    weighted by word frequency) -> (argmax pair, count-desc then
    pair-asc tie-break) -> (apply the merge corpus-wide).

    Exactly how this scales to 100 TB: the corpus never leaves the
    cluster — each round is ONE map-side-combinable groupBy over
    exploded adjacent pairs of the (word, freq) table (which is itself
    a pre-aggregated groupBy over the corpus, shrinking 100 TB of text
    to a vocabulary-sized relation), and the driver collects only the
    single argmax row per round (the same bounded-collect contract as
    the k-means centroid loop).  Merge application is a pure string
    expression over the word table, not the corpus.

    Merge-application semantics (pinned, identical in the SQL oracle):
    tokens are space-joined; applying merge (a, b) replaces
    ``' a b '`` with ``' ab '`` in ``' '||tokens||' '`` TWICE — a
    single non-overlapping left-to-right pass misses at most
    alternating occurrences in runs (consecutive occurrences share the
    delimiter space), and misses are never adjacent (each miss follows
    a match), so a second pass is exact.

    Returns one row per learned merge: ``(rank, pair, merged, freq)``.
    """
    words = (
        documents.select(
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w")
        )
        .where((F.length("w") > 0) & (F.length("w") <= max_word_len))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
        .select(
            F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")).alias("t"), "freq"
        )
    )
    spark = documents.sparkSession
    base = words.persist()  # the corpus-sized aggregation runs once
    words = base
    try:
        merges = []
        for rank in range(1, n_merges + 1):
            best = (
                words.select(F.split("t", " ").alias("toks"), "freq")
                .select(
                    F.explode(
                        # CASE guard: Spark's sequence(0, -1) DESCENDS
                        # rather than yielding empty, so single-token
                        # words (no adjacent pairs) need an explicit
                        # empty array; explode then drops them.
                        F.expr(
                            "CASE WHEN size(toks) < 2 THEN array()"
                            " ELSE transform(sequence(0, size(toks) - 2),"
                            " i -> concat(element_at(toks, i + 1), ' ',"
                            " element_at(toks, i + 2))) END"
                        )
                    ).alias("pair"),
                    "freq",
                )
                .groupBy("pair")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(1)
                .collect()  # bounded: exactly one argmax row per round
            )
            if not best:
                break
            pair, cnt = best[0]["pair"], int(best[0]["cnt"])
            merged = pair.replace(" ", "")
            merges.append((rank, pair, merged, cnt))
            pat, rep = f" {pair} ", f" {merged} "
            # Lazy merge chain (r13): round r's argmax evaluates r - 1
            # stacked replace projections over the ONE persisted
            # vocabulary — pure string expressions on a
            # vocabulary-sized relation, far cheaper than the per-round
            # persist + count + unpersist this replaces (two actions
            # and a materialization per merge; the A/B is in
            # OPTIMIZATION_r13.md).  The chain depth is bounded by
            # n_merges, so plan growth is O(n_merges) projections.
            words = words.select(
                F.expr(
                    "trim(replace(replace(concat(' ', t, ' '),"
                    f" '{pat}', '{rep}'), '{pat}', '{rep}'))"
                ).alias("t"),
                "freq",
            )
    finally:
        base.unpersist()
    return spark.createDataFrame(
        merges, "rank INT, pair STRING, merged STRING, freq BIGINT"
    )


def bpe_tokenize(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_len: int = 30,
) -> DataFrame:
    """Apply learned BPE merges (round 9 — ``bpe_train``'s twin):
    tokenize the corpus under a fixed merge list and report per-doc
    word and token counts, the sizing pass every training-data
    pipeline runs before packing.

    Scale shape: the merge chain is applied ONCE to the distinct-word
    vocabulary (a tiny relation, same pinned double-replace semantics
    as training), which then BROADCAST-joins back to the exploded
    (doc, word) stream — the corpus itself never passes through the
    merge expressions, and the join adds no shuffle on the big side.

    Returns ``(doc_id, n_words, n_tokens)``.
    """
    words = documents.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w"),
    ).where((F.length("w") > 0) & (F.length("w") <= max_word_len))
    t = F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 "))
    for pair, merged in merges:
        pat, rep = F.lit(f" {pair} "), F.lit(f" {merged} ")
        t = F.trim(
            F.replace(
                F.replace(F.concat(F.lit(" "), t, F.lit(" ")), pat, rep), pat, rep
            )
        )
    vocab = (
        words.select("w").distinct().select("w", F.size(F.split(t, " ")).alias("n_tok"))
    )
    return (
        words.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


def bpe_fertility(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    max_word_len: int = 30,
) -> DataFrame:
    """Tokenizer-coverage readout (round 9): per-language FERTILITY —
    tokens per word under a fixed merge list — the standard metric for
    how well a tokenizer fits each language in a multilingual corpus
    (high fertility = the language pays more sequence length per word).

    Same scale shape as ``bpe_tokenize``: merges apply once to the
    vocabulary, broadcast-join back to the exploded (lang, word)
    stream, one map-side-combined groupBy on language.  Fertility is
    integer parts-per-million (floor division over exact counts) so
    the oracle replays it bit-for-bit.

    Returns ``(lang, n_words, n_tokens, fertility_ppm)``.
    """
    words = documents.select(
        F.col(lang_col).alias("lang"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w"),
    ).where((F.length("w") > 0) & (F.length("w") <= max_word_len))
    t = F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 "))
    for pair, merged in merges:
        pat, rep = F.lit(f" {pair} "), F.lit(f" {merged} ")
        t = F.trim(
            F.replace(
                F.replace(F.concat(F.lit(" "), t, F.lit(" ")), pat, rep), pat, rep
            )
        )
    vocab = (
        words.select("w").distinct().select("w", F.size(F.split(t, " ")).alias("n_tok"))
    )
    return (
        words.join(F.broadcast(vocab), "w")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .select(
            "lang",
            "n_words",
            "n_tokens",
            F.expr("(n_tokens * 1000000) div n_words").cast("long").alias(
                "fertility_ppm"
            ),
        )
    )


def json_extract_features(documents: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Semi-structured JSON extraction (round 9): every real corpus
    carries JSON metadata sidecars (CC 'metadata' records, API dumps,
    annotation exports), so the engine needs the native JSON path —
    not a regex.  A deterministic JSON payload is planted per doc
    (arithmetic in the id, built with format_string so the oracle
    builds the identical string with printf), then parsed with
    ``from_json`` — Spark's real Jackson-backed parser, JVM-side
    codegen, no Python — extracting scalars, a nested struct field,
    and array length/indexing.  The DuckDB oracle parses the same
    string with its native yyjson functions: two independent JSON
    parsers must agree on every extracted value.

    Returns ``(doc_id, views, score, n_tags, tag0)``.
    """
    i = F.col(id_col).cast("long")
    payload = F.format_string(
        '{"id": %d, "views": %d, "tags": ["t%d", "t%d"], "meta": {"score": %d}}',
        i, (i * 7) % 1000, i % 5, (i + 1) % 7, (i * 3) % 100,
    )
    parsed = F.from_json(
        payload,
        "id BIGINT, views BIGINT, tags ARRAY<STRING>, meta STRUCT<score: BIGINT>",
    )
    return documents.select(
        i.alias("doc_id"),
        parsed["views"].alias("views"),
        parsed["meta"]["score"].alias("score"),
        F.size(parsed["tags"]).cast("long").alias("n_tags"),
        parsed["tags"][0].alias("tag0"),
    )


def url_parse_features(documents: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """URL structure extraction (round 9): crawl pipelines key
    everything on the parsed URL (host-level dedup/blocklists,
    path-depth heuristics, tracking-param stripping), so the engine
    exposes Spark's NATIVE ``parse_url`` (JVM, java.net.URI-backed —
    not a regex).  URLs are planted arithmetic in the id:

        https://host{id % 50}.example.org/cat{id % 7}/p{id}?ref=r{id % 3}

    and HOST / PATH / the ``ref`` QUERY param are extracted natively.
    The oracle rebuilds the same fields from the id arithmetic — a
    value check that the parser splits exactly where the RFC says.

    Returns ``(doc_id, host, path, ref, path_depth)``.
    """
    i = F.col(id_col).cast("long")
    url = F.format_string(
        "https://host%d.example.org/cat%d/p%d?ref=r%d",
        i % 50, i % 7, i, i % 3,
    )
    return documents.select(
        i.alias("doc_id"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
        (
            F.length(F.parse_url(url, F.lit("PATH")))
            - F.length(F.replace(F.parse_url(url, F.lit("PATH")), F.lit("/"), F.lit("")))
        ).cast("long").alias("path_depth"),
    )


def xml_extract_features(documents: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """XML extraction (round 9): the other metadata sidecar format
    (sitemaps, RSS/Atom feeds, Wikipedia dumps, PubMed) — parsed with
    Spark's NATIVE XPath family (``xpath_string``/``xpath_long``/
    ``xpath`` — JVM javax.xml, not a regex).  A deterministic XML
    payload is planted per doc:

        <doc id="{id}"><title>t{id % 11}</title>
          <views>{(7*id) % 1000}</views>
          <tags><tag>g{id % 5}</tag><tag>g{(id+1) % 7}</tag></tags></doc>

    extracting an attribute, a text node, a numeric node, and a
    node-set count.  The oracle rebuilds the fields from the id
    arithmetic — a value check on the real XML parser's split points.

    Returns ``(doc_id, title, views, n_tags, tag0)``.
    """
    i = F.col(id_col).cast("long")
    xml = F.format_string(
        '<doc id="%d"><title>t%d</title><views>%d</views>'
        "<tags><tag>g%d</tag><tag>g%d</tag></tags></doc>",
        i, i % 11, (i * 7) % 1000, i % 5, (i + 1) % 7,
    )
    return documents.select(
        i.alias("doc_id"),
        F.xpath_string(xml, F.lit("/doc/title")).alias("title"),
        F.xpath_long(xml, F.lit("/doc/views")).alias("views"),
        F.size(F.xpath(xml, F.lit("/doc/tags/tag/text()"))).cast("long").alias("n_tags"),
        F.xpath_string(xml, F.lit("/doc/tags/tag[1]")).alias("tag0"),
    )
