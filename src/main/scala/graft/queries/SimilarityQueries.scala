package graft.queries

import graft.{GraftQuery, QueryModule, Tables}
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search + sketch-dedup query surface (LLM-pipeline
  * extension per BASELINE.json). Exact-math operators carry DuckDB
  * oracles (list_reduce folds left-to-right like Spark's `aggregate`, so
  * doubles are bit-identical); the randomized sketch operators
  * (MinHash/SimHash) are checked rows-only here and by invariant specs
  * in DedupSpec (candidates ⊇ true near-dups).
  */
object SimilarityQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Brute-force cosine top-k (the correctness baseline for ANN). */
  private val cosineTopK = GraftQuery(
    "sim_cosine_topk",
    (s, dir) =>
      Similarity.bruteForceTopK(
        t(s, dir, "embeddings"), "vec_id", "embedding", queryId = 0L, k = 10),
    Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
      SELECT vec_id,
        list_reduce(list_transform(list_zip(embedding, qv),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (a,b) -> a+b)
        / (sqrt(list_reduce(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b))
           * sqrt(list_reduce(list_transform(qv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b)))
        AS cos
      FROM embeddings, q WHERE vec_id <> 0
      ORDER BY cos DESC, vec_id LIMIT 10"""))

  /** Pairwise high-similarity detection within sign-LSH buckets — the
    * scale path: bucket shuffle + within-bucket join, no global O(n²). */
  private val lshBuckets = GraftQuery(
    "sim_lsh_buckets",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          Similarity.signLshBucket(col("embedding"), 12).as("bucket"))
      e.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vectors"),
          countDistinct(col("label")).as("n_labels"),
          min(col("vec_id")).as("min_vec_id"))
        .filter(col("n_vectors") > 1)
        .orderBy(col("bucket"))
    },
    Some("""WITH b AS (
        SELECT vec_id, label,
          list_reduce(list_transform(embedding[1:12],
            x -> CASE WHEN x > 0 THEN 1 ELSE 0 END),
            (a, v) -> a * 2 + v) AS bucket
        FROM embeddings)
      SELECT bucket, COUNT(*) AS n_vectors,
        COUNT(DISTINCT label) AS n_labels, MIN(vec_id) AS min_vec_id
      FROM b GROUP BY bucket HAVING COUNT(*) > 1 ORDER BY bucket"""))

  /** IVF-style coarse quantization: assign every vector to the nearest
    * of 4 fixed centroids (vec_ids 0..3) by dot product; per-cell stats.
    * At scale the centroids come from a sampled k-means and the search
    * probes only the query's cell. */
  private val ivfAssign = GraftQuery(
    "sim_ivf_assign",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = e.filter(col("vec_id") < 4)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      e.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          struct(Similarity.dot(col("embedding"), col("c_vec")).as("score"),
            (-col("c_id")).as("negidx")).as("sc"))
        .groupBy(col("vec_id"))
        .agg((-max(col("sc")).getField("negidx")).as("cell"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_member"))
        .orderBy(col("cell"))
    },
    Some("""WITH cents AS (
        SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings
        WHERE vec_id < 4),
      scored AS (
        SELECT vec_id, c_id,
          list_reduce(list_transform(list_zip(embedding, c_vec),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (a,b) -> a+b)
          AS score
        FROM embeddings, cents),
      assigned AS (
        SELECT vec_id, c_id AS cell FROM (
          SELECT vec_id, c_id, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY score DESC, c_id) AS rn
          FROM scored) WHERE rn = 1)
      SELECT cell, COUNT(*) AS n_vectors, MIN(vec_id) AS min_member
      FROM assigned GROUP BY cell ORDER BY cell"""))

  /** IVF probe search: assign all vectors (and the query) to coarse
    * cells, then rank ONLY the query's cell — the full ANN search path.
    * At 100 TB: vectors live hash-partitioned by cell, the probe reads
    * one cell's partitions, and the top-k is TakeOrderedAndProject
    * within them; brute force (sim_cosine_topk) is the recall oracle. */
  private val ivfTopK = GraftQuery(
    "sim_ivf_topk",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = e.filter(col("vec_id") < 4)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val cells = e.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          struct(Similarity.dot(col("embedding"), col("c_vec")).as("score"),
            (-col("c_id")).as("negidx")).as("sc"))
        .groupBy(col("vec_id"))
        .agg((-max(col("sc")).getField("negidx")).as("cell"))
      val withCell = e.join(cells, "vec_id")
      val q = withCell.filter(col("vec_id") === 0)
        .select(col("cell").as("q_cell"), col("embedding").as("q_vec"))
      withCell.crossJoin(broadcast(q))
        .filter(col("cell") === col("q_cell") && col("vec_id") =!= 0)
        .select(col("vec_id"),
          Similarity.cosine(col("embedding"), col("q_vec")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(5)
    },
    Some("""WITH cents AS (
        SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings
        WHERE vec_id < 4),
      scored AS (
        SELECT vec_id, c_id,
          list_reduce(list_transform(list_zip(embedding, c_vec),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (a,b) -> a+b)
          AS score
        FROM embeddings, cents),
      cells AS (
        SELECT vec_id, c_id AS cell FROM (
          SELECT vec_id, c_id, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY score DESC, c_id) AS rn
          FROM scored) WHERE rn = 1),
      wc AS (
        SELECT e.vec_id, e.embedding, c.cell
        FROM embeddings e, cells c WHERE e.vec_id = c.vec_id),
      q AS (SELECT cell AS q_cell, embedding AS q_vec FROM wc
        WHERE vec_id = 0)
      SELECT vec_id,
        list_reduce(list_transform(list_zip(embedding, q_vec),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (a,b) -> a+b)
        / (sqrt(list_reduce(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b))
           * sqrt(list_reduce(list_transform(q_vec,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b)))
        AS cos
      FROM wc, q WHERE cell = q_cell AND vec_id <> 0
      ORDER BY cos DESC, vec_id LIMIT 5"""))

  /** Embedding column stats (norms — exact sequential fold both sides). */
  private val embStats = GraftQuery(
    "sim_embedding_stats",
    (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"), Similarity.norm2(col("embedding")).as("nrm"),
          size(col("embedding")).as("dim"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          min(col("nrm")).as("min_norm"),
          max(col("nrm")).as("max_norm"),
          min(col("dim")).as("dim"))
        .orderBy(col("label")),
    Some("""WITH n AS (
        SELECT label,
          sqrt(list_reduce(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b)) AS nrm,
          len(embedding) AS dim
        FROM embeddings)
      SELECT label, COUNT(*) AS n, MIN(nrm) AS min_norm,
        MAX(nrm) AS max_norm, MIN(dim) AS dim
      FROM n GROUP BY label ORDER BY label"""))

  /** MinHash+LSH near-dup candidates through the PARAMETERIZED-hash
    * pipeline (Dedup.portableHash = md5-prefix, reproducible in DuckDB)
    * — the identical band-join shape as the xxhash64 production default
    * (which DedupSpec pins differentially), now with a full value-level
    * oracle: the DuckDB SQL recomputes shingles → 32 permuted mins →
    * 16 bands of 2 → banded self-join, bit-for-bit. */
  private val minhash = GraftQuery(
    "dedup_minhash_lsh",
    (s, dir) =>
      // 2-token shingles + 16 bands of 2: higher band-collision
      // probability so moderate near-dups surface at every scale factor
      // (the tighter library default 3/8×4 targets high-jaccard pairs).
      Dedup.minhashCandidates(
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text",
        shingleSize = 2, k = 32, bands = 16, hashFn = Dedup.portableHash)
        .orderBy(col("a_id"), col("b_id")),
    Some("""WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE doc_id < 200),
      sh AS (
        SELECT doc_id, list_distinct(list_transform(range(len(toks)-1),
          i -> toks[i+1] || ' ' || toks[i+2])) AS shingles
        FROM docs),
      h AS (
        SELECT doc_id, list_transform(shingles,
          s -> ('0x'||substr(md5(s),1,15))::BIGINT % 1000000007) AS hs
        FROM sh),
      sig AS (
        SELECT doc_id, list_transform(range(32),
          j -> list_min(list_transform(hs,
            h -> (h * ((2654435761 + 40503*j) % 1000000007)
                  + ((2246822519 + 604171*j) % 1000000007))
                 % 1000000007))) AS sig
        FROM h),
      bands AS (
        SELECT doc_id, b AS band_id,
          ('0x'||substr(md5(
            CAST(sig[2*b+1] AS VARCHAR) || '_' || CAST(sig[2*b+2] AS VARCHAR)
          ),1,15))::BIGINT AS band_hash
        FROM sig, (SELECT unnest(range(16)) AS b))
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared_bands
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
          AND a.doc_id < b.doc_id
      GROUP BY 1, 2 ORDER BY a_id, b_id"""))

  /** SimHash near-dup candidates through the parameterized portable
    * hash (composed-builtin signature; the native codegen'd
    * SimHash64Expr stays the production default, pinned differentially
    * by ExtensionSpec) — full oracle: DuckDB recomputes per-token
    * 60-bit hashes → 64 bit-votes → signature → 9 pigeonhole bands →
    * banded self-join → exact hamming filter. */
  private val simhash = GraftQuery(
    "dedup_simhash",
    (s, dir) =>
      Dedup.simhashCandidates(
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text",
        maxHamming = 8, hashFn = Some(Dedup.portableHash))
        .select(col("a_id"), col("b_id"),
          col("hamming").cast(LongType).as("hamming"))
        .orderBy(col("a_id"), col("b_id")),
    Some("""WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 200),
      h AS (SELECT doc_id,
        ('0x'||substr(md5(tok),1,15))::BIGINT AS hv FROM toks),
      bits AS (
        SELECT doc_id, b.b,
          SUM(CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) b
        GROUP BY doc_id, b.b),
      sig AS (
        SELECT doc_id, CAST(SUM(CASE WHEN vote > 0
          THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sig
        FROM bits GROUP BY doc_id),
      bands AS (
        SELECT doc_id, sig, i AS band_id,
          (sig >> CAST(i*64//9 AS INT))
            & ((CAST(1 AS BIGINT) << CAST((i+1)*64//9 - i*64//9 AS INT)) - 1)
            AS band_val
        FROM sig, (SELECT unnest(range(9)) AS i))
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
          AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sig, b.sig)) <= 8
      ORDER BY a_id, b_id"""))

  /** Embedding-cosine near-duplicate pairs, blocked by sign-LSH bucket
    * (within-bucket pairwise only — the 100 TB shape; a global pairwise
    * cosine would be O(n²)). Exact fold math → full oracle. */
  private val cosineNearDup = GraftQuery(
    "dedup_embedding_cosine",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          Similarity.signLshBucket(col("embedding"), 8).as("bucket"))
      val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_v"),
        col("bucket"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_v"),
        col("bucket"))
      a.join(b, Seq("bucket"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          Similarity.cosine(col("a_v"), col("b_v")).as("cos"))
        .filter(col("cos") > 0.2)
        .orderBy(col("a_id"), col("b_id"))
    },
    Some("""WITH e AS (
        SELECT vec_id, embedding,
          list_reduce(list_transform(embedding[1:8],
            x -> CASE WHEN x > 0 THEN 1 ELSE 0 END),
            (a, v) -> a * 2 + v) AS bucket
        FROM embeddings)
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        list_reduce(list_transform(list_zip(a.embedding, b.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q) -> p+q)
        / (sqrt(list_reduce(list_transform(a.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p,q) -> p+q))
           * sqrt(list_reduce(list_transform(b.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p,q) -> p+q)))
        AS cos
      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE list_reduce(list_transform(list_zip(a.embedding, b.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q) -> p+q)
        / (sqrt(list_reduce(list_transform(a.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p,q) -> p+q))
           * sqrt(list_reduce(list_transform(b.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p,q) -> p+q)))
        > 0.2
      ORDER BY a_id, b_id"""))

  /** One Lloyd's-iteration centroid update — the IVF TRAINING step
    * that produces `sim_ivf_assign`'s coarse quantizer: assign every
    * vector to its nearest seed centroid (broadcast k×N scoring, no
    * shuffle), then recompute each cell's centroid as the per-dimension
    * mean (ONE (cell, dim) grouped aggregate). At 100 TB both stages
    * distribute trivially: the k seed vectors broadcast, the update is
    * a map-side-combined agg over k×d cells — the standard scalable
    * k-means step. First 8 dimensions emitted (k×8 rows). */
  private val kmeansUpdate = GraftQuery(
    "sim_kmeans_update",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = e.filter(col("vec_id") < 4)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val assigned = e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"),
          struct(Similarity.dot(col("embedding"), col("c_vec")).as("score"),
            (-col("c_id")).as("negidx")).as("sc"))
        .groupBy(col("vec_id"))
        .agg((-max(col("sc")).getField("negidx")).as("cell"),
          first(col("embedding")).as("emb"))
      assigned
        .select(col("cell"), posexplode(col("emb")).as(Seq("dim", "v")))
        .filter(col("dim") < 8)
        .groupBy(col("cell"), col("dim").cast(IntegerType).as("dim"))
        .agg(round(avg(col("v").cast(DoubleType)), 6).as("centroid_val"))
        .orderBy(col("cell"), col("dim"))
    },
    Some("""WITH cents AS (
        SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings
        WHERE vec_id < 4),
      scored AS (
        SELECT vec_id, c_id,
          list_reduce(list_transform(list_zip(embedding, c_vec),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (a,b) -> a+b)
          AS score
        FROM embeddings, cents),
      assigned AS (
        SELECT vec_id, c_id AS cell FROM (
          SELECT vec_id, c_id, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY score DESC, c_id) AS rn
          FROM scored) WHERE rn = 1),
      vals AS (
        SELECT a.cell,
          CAST(unnest(range(1, len(e.embedding) + 1)) AS INT) - 1 AS dim,
          CAST(unnest(e.embedding) AS DOUBLE) AS v
        FROM assigned a JOIN embeddings e ON a.vec_id = e.vec_id)
      SELECT cell, dim, round(avg(v), 6) AS centroid_val
      FROM vals WHERE dim < 8
      GROUP BY cell, dim ORDER BY cell, dim"""))

  /** Product-quantization encode (the IVF+PQ compression path: split
    * each 64-dim vector into 8 subvectors of 8 dims; each subvector
    * quantizes to its nearest sub-codebook entry, here seeded from
    * vectors 0-3). The code is 8 crumbs ≈ 2 bytes per vector vs 256
    * bytes raw — the memory ratio that makes billion-vector ANN fit.
    * Assignment is a broadcast join on the sub-index; the fold order
    * of the L2 distance is fixed (sequential over 8 dims) so the
    * argmin is bit-deterministic and oracle-exact. */
  private val pqEncode = GraftQuery(
    "sim_pq_codes",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      def subvecs(src: DataFrame, idCol: String) = src
        .select(col(idCol), explode(sequence(lit(0), lit(7))).as("j"),
          col("embedding"))
        .select(col(idCol), col("j"),
          slice(col("embedding"), col("j") * 8 + 1, lit(8)).as("sv"))
      def l2(a: Column, b: Column): Column = aggregate(
        zip_with(a, b, (x, y) => {
          val d = x.cast(DoubleType) - y.cast(DoubleType); d * d
        }), lit(0.0), (acc, v) => acc + v)
      val subs = subvecs(e.filter(col("vec_id") < 50), "vec_id")
      val cents = subvecs(e.filter(col("vec_id") < 4)
          .withColumnRenamed("vec_id", "c_id"), "c_id")
        .withColumnRenamed("sv", "cv")
      subs.join(broadcast(cents), "j")
        .select(col("vec_id"), col("j"),
          struct((-l2(col("sv"), col("cv"))).as("negd"),
            (-col("c_id")).as("negc")).as("sc"))
        .groupBy(col("vec_id"), col("j"))
        .agg((-max(col("sc")).getField("negc")).as("code"))
        .groupBy(col("vec_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("j"), col("code")))),
          x => x.getField("code").cast(StringType)), "").as("pq_code"))
        .orderBy(col("vec_id"))
    },
    Some("""WITH subs AS (
        SELECT vec_id, CAST(j AS INT) AS j,
          list_slice(embedding, j*8 + 1, j*8 + 8) AS sv
        FROM embeddings, unnest(range(0, 8)) AS u(j) WHERE vec_id < 50),
      cents AS (
        SELECT vec_id AS c_id, CAST(j AS INT) AS j,
          list_slice(embedding, j*8 + 1, j*8 + 8) AS cv
        FROM embeddings, unnest(range(0, 8)) AS u(j) WHERE vec_id < 4),
      scored AS (
        SELECT s.vec_id, s.j, c.c_id,
          list_reduce(list_transform(list_zip(s.sv, c.cv),
            x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) *
                 (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))),
            (a, b) -> a + b) AS d
        FROM subs s JOIN cents c USING (j)),
      coded AS (
        SELECT vec_id, j, c_id AS code FROM (
          SELECT vec_id, j, c_id, ROW_NUMBER() OVER (
            PARTITION BY vec_id, j ORDER BY d, c_id) AS rn
          FROM scored) WHERE rn = 1)
      SELECT vec_id,
        string_agg(CAST(code AS VARCHAR), '' ORDER BY j) AS pq_code
      FROM coded GROUP BY vec_id ORDER BY vec_id"""))

  /** IVF-PQ asymmetric-distance search (the standard billion-vector ANN
    * shape: coarse IVF cell probe + PQ codes + per-query lookup table;
    * Jégou et al. 2011, "Product Quantization for Nearest Neighbor
    * Search"). The query never decodes a candidate: it builds one
    * 8×4 LUT of (subquantizer, codeword) → squared-L2 distance,
    * BROADCASTS it, and each candidate's distance is the j-ordered sum
    * of 8 LUT lookups over its code — table lookups, not vector math.
    * At 100 TB: codes are 8 crumbs/vector (the only per-vector state
    * read), the LUT is bytes, the probe touches one cell's partitions,
    * and the top-k is TakeOrderedAndProject. The ADC sum folds in
    * fixed j order (sort_array → sequential aggregate) so the doubles
    * are bit-identical to the oracle's ORDER BY j list_reduce. */
  private val ivfpqTopK = GraftQuery(
    "sim_ivfpq_topk",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      def subvecs(src: DataFrame, idCol: String) = src
        .select(col(idCol), explode(sequence(lit(0), lit(7))).as("j"),
          slice(col("embedding"), col("j") * 8 + 1, lit(8)).as("sv"))
      def l2(a: Column, b: Column): Column = aggregate(
        zip_with(a, b, (x, y) => {
          val d = x.cast(DoubleType) - y.cast(DoubleType); d * d
        }), lit(0.0), (acc, v) => acc + v)
      // coarse quantizer: cells from the 4 seed centroids
      val cents = e.filter(col("vec_id") < 4)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val cells = e.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          struct(Similarity.dot(col("embedding"), col("c_vec")).as("score"),
            (-col("c_id")).as("negidx")).as("sc"))
        .groupBy(col("vec_id"))
        .agg((-max(col("sc")).getField("negidx")).as("cell"))
      // PQ codebook (8 subquantizers × 4 codewords) + per-vector codes
      val cbook = subvecs(e.filter(col("vec_id") < 4)
          .withColumnRenamed("vec_id", "c_id"), "c_id")
        .withColumnRenamed("sv", "cv")
        .withColumnRenamed("c_id", "code")
      val codes = subvecs(e, "vec_id").join(broadcast(cbook), "j")
        .select(col("vec_id"), col("j"),
          struct((-l2(col("sv"), col("cv"))).as("negd"),
            (-col("code")).as("negc")).as("sc"))
        .groupBy(col("vec_id"), col("j"))
        .agg((-max(col("sc")).getField("negc")).as("code"))
      // per-query LUT: distance from the query's subvector j to every
      // codeword of subquantizer j — 32 rows, broadcast
      val lut = subvecs(e.filter(col("vec_id") === 0), "vec_id")
        .select(col("j"), col("sv").as("qv"))
        .join(cbook, "j")
        .select(col("j"), col("code"), l2(col("qv"), col("cv")).as("dist"))
      val qcell = cells.filter(col("vec_id") === 0)
        .select(col("cell").as("q_cell"))
      // probe the query's cell; ADC = j-ordered fold of LUT lookups
      cells.crossJoin(broadcast(qcell))
        .filter(col("cell") === col("q_cell") && col("vec_id") =!= 0)
        .join(codes, "vec_id")
        .join(broadcast(lut), Seq("j", "code"))
        .groupBy(col("vec_id"))
        .agg(aggregate(
          sort_array(collect_list(struct(col("j"), col("dist")))),
          lit(0.0), (acc, x) => acc + x.getField("dist")).as("adc_dist"))
        .orderBy(col("adc_dist"), col("vec_id"))
        .limit(10)
    },
    Some("""WITH cents AS (
        SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings
        WHERE vec_id < 4),
      cscored AS (
        SELECT vec_id, c_id,
          list_reduce(list_transform(list_zip(embedding, c_vec),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (a,b) -> a+b)
          AS score
        FROM embeddings, cents),
      cells AS (
        SELECT vec_id, c_id AS cell FROM (
          SELECT vec_id, c_id, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY score DESC, c_id) AS rn
          FROM cscored) WHERE rn = 1),
      cbook AS (
        SELECT vec_id AS code, CAST(j AS INT) AS j,
          list_slice(embedding, j*8 + 1, j*8 + 8) AS cv
        FROM embeddings, unnest(range(0, 8)) AS u(j) WHERE vec_id < 4),
      subs AS (
        SELECT vec_id, CAST(j AS INT) AS j,
          list_slice(embedding, j*8 + 1, j*8 + 8) AS sv
        FROM embeddings, unnest(range(0, 8)) AS u(j)),
      coded AS (
        SELECT vec_id, j, code FROM (
          SELECT s.vec_id, s.j, c.code, ROW_NUMBER() OVER (
            PARTITION BY s.vec_id, s.j ORDER BY
              list_reduce(list_transform(list_zip(s.sv, c.cv),
                x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) *
                     (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))),
                (a, b) -> a + b), c.code) AS rn
          FROM subs s JOIN cbook c USING (j)) WHERE rn = 1),
      lut AS (
        SELECT c.j, c.code,
          list_reduce(list_transform(list_zip(q.sv, c.cv),
            x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) *
                 (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))),
            (a, b) -> a + b) AS dist
        FROM cbook c JOIN (SELECT j, sv FROM subs WHERE vec_id = 0) q
          USING (j)),
      qcell AS (SELECT cell AS q_cell FROM cells WHERE vec_id = 0)
      SELECT v.vec_id,
        list_reduce(list(l.dist ORDER BY l.j), (a, b) -> a + b)
          AS adc_dist
      FROM cells v, qcell, coded k, lut l
      WHERE v.cell = q_cell AND v.vec_id <> 0
        AND k.vec_id = v.vec_id AND l.j = k.j AND l.code = k.code
      GROUP BY v.vec_id
      ORDER BY adc_dist, v.vec_id LIMIT 10"""))

  override val queries: Seq[GraftQuery] = Seq(
    cosineTopK, lshBuckets, ivfAssign, ivfTopK, embStats, minhash, simhash,
    cosineNearDup, kmeansUpdate, pqEncode, ivfpqTopK)
}
