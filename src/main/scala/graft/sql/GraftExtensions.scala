package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{
  Add, And, BloomFilterMightContain, CaseWhen, Cast, Concat, Conv,
  CurrentTimestamp, DateFormatClass,
  Divide, EqualTo, Expression, ExpressionInfo,
  Base64, Exp, GetJsonObject, GreaterThan, Hex, HllSketchEstimate, If, In,
  IsNotNull, IsNull, Length, LengthOfJsonArray, LessThan, Literal, Log,
  Log10, Lower, Multiply, OctetLength, Or, Pow, RegExpExtract, Sha1, Size,
  Slice, SoundEx, StringLocate, StringRepeat, StringReplace, StringSplitSQL,
  StringTrim, Substring, TruncDate, UnBase64, Unhex, XxHash64, Year}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  HllSketchAgg, HllUnionAgg, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.expressions.variant.ParseJson
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DateType,
  DoubleType, IntegerType, LongType, StringType, TimestampNTZType, TimestampType}

import graft.sql.expressions.{ArrayDot, CdcBounds, Checksum, FeatureHash, FnvHash, HilbertValue, Md5H64, MinHashSig, QuantizeI8, RhpSignature, SimHash60, SimHashBits, SpanKeep, ZValue, ZValue3}

/** Session extensions registering the Redshift function-name surface that
  * Spark's parser accepts but its registry lacks (SURVEY.md §2.2 🔧/🔴):
  *
  *   fnv_hash(x)          native Catalyst expression (codegen'd)
  *   checksum(x)          native Catalyst expression (codegen'd)
  *   charindex(sub, s)    → StringLocate (Redshift arg order == position())
  *   len(s)               → Length
  *   regexp_substr(s, p)  → RegExpExtract(s, p, 0)
  *
  * plus the LLM-pipeline array kernels (codegen'd tight loops replacing
  * interpreted higher-order-function chains on the dedup/similarity hot
  * paths — see [[graft.sql.expressions.ArrayKernels]]):
  *
  *   array_dot(a, b)      sequential-order dot product of array<double>
  *   simhash60(hs)        60-bit SimHash of array<bigint> token hashes
  *   minhash_sig(hs, k)   k MinHash minima of array<bigint> (k literal)
  *
  * Activate with `.config("spark.sql.extensions", "graft.sql.GraftExtensions")`
  * — a plain config key, so spark-submit / notebook users get the dialect
  * surface without code changes. Syntax-level constructs (TOP, SIMILAR TO,
  * APPROXIMATE, RATIO_TO_REPORT) live in [[RedshiftSql]] instead: they
  * never reach function resolution.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach(ext.injectFunction)
    // plain-SQL range joins → bucketed equi joins, opt-in via
    // spark.graft.rangeJoin.bucketWidth (see graft.plans.RangeJoinRule)
    ext.injectOptimizerRule(graft.plans.RangeJoinRule.apply)
    // k exact percentiles over one column → ONE shared buffer
    // (see graft.plans.MergePercentileRule)
    ext.injectOptimizerRule(_ => graft.plans.MergePercentileRule)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("fnv_hash"),
      info("fnv_hash", "fnv_hash(expr) - 64-bit FNV-1a hash of expr."),
      (args: Seq[Expression]) => FnvHash(args.head)),
    (FunctionIdentifier("checksum"),
      info("checksum", "checksum(expr) - 32-bit checksum of expr."),
      (args: Seq[Expression]) => Checksum(args.head)),
    (FunctionIdentifier("charindex"),
      info("charindex", "charindex(substr, str) - 1-based position of substr in str, 0 if absent."),
      (args: Seq[Expression]) => new StringLocate(args(0), args(1))),
    (FunctionIdentifier("len"),
      info("len", "len(str) - length of str."),
      (args: Seq[Expression]) => Length(args.head)),
    (FunctionIdentifier("regexp_substr"),
      info("regexp_substr", "regexp_substr(str, regexp) - first match of regexp in str."),
      (args: Seq[Expression]) =>
        if (args.length >= 3) RegExpExtract(args(0), args(1), args(2))
        else RegExpExtract(args(0), args(1), Literal(0))),
    // The kernel expressions read raw ArrayData, so SQL-side inputs are
    // coerced with explicit Casts here (ExpectsInputTypes is private[sql];
    // a no-op Cast is removed by Catalyst's SimplifyCasts).
    (FunctionIdentifier("array_dot"),
      info("array_dot", "array_dot(a, b) - sequential-order dot product of two array<double>."),
      (args: Seq[Expression]) => ArrayDot(
        Cast(args(0), ArrayType(DoubleType)), Cast(args(1), ArrayType(DoubleType)))),
    (FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(hs) - 60-bit SimHash over array<bigint> token hashes."),
      (args: Seq[Expression]) => SimHash60(Cast(args.head, ArrayType(LongType)))),
    (FunctionIdentifier("md5_h64"),
      info("md5_h64", "md5_h64(str) - portable full-range 64-bit md5 hash (first 16 hex chars as a two's-complement bit pattern), one digest per row."),
      (args: Seq[Expression]) => Md5H64(Cast(args.head, StringType))),
    (FunctionIdentifier("quantize_i8"),
      info("quantize_i8", "quantize_i8(v) - struct(qmin, qstep, qv): one-pass int8-range quantization of array<double>."),
      (args: Seq[Expression]) => QuantizeI8(Cast(args.head, ArrayType(DoubleType)))),
    (FunctionIdentifier("simhash_bits"),
      info("simhash_bits", "simhash_bits(hs, bits) - bits-wide SimHash over array<bigint> token hashes; bits must be an integer literal <= 64."),
      (args: Seq[Expression]) => args(1) match {
        case Literal(b: Int, IntegerType) if b >= 1 && b <= 64 =>
          SimHashBits(Cast(args(0), ArrayType(LongType)), b)
        case other => throw new IllegalArgumentException(
          s"simhash_bits: bits must be an integer literal in [1, 64], got $other")
      }),
    (FunctionIdentifier("rhp_signature"),
      info("rhp_signature", "rhp_signature(v, nPlanes, dim) - array<boolean> sign-LSH signature of array<double> against the deterministic md5-derived hyperplanes; nPlanes and dim must be integer literals."),
      (args: Seq[Expression]) => (args(1), args(2)) match {
        case (Literal(p: Int, IntegerType), Literal(d: Int, IntegerType))
            if p >= 1 && d >= 1 =>
          RhpSignature(Cast(args(0), ArrayType(DoubleType)), p, d)
        case other => throw new IllegalArgumentException(
          s"rhp_signature: nPlanes and dim must be positive integer literals, got $other")
      }),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(hs, k) - array of k MinHash minima over array<bigint>; k must be an integer literal."),
      (args: Seq[Expression]) => args(1) match {
        case Literal(k: Int, IntegerType) => MinHashSig(Cast(args(0), ArrayType(LongType)), k)
        case other => throw new IllegalArgumentException(
          s"minhash_sig: k must be an integer literal, got $other")
      }),
    (FunctionIdentifier("zvalue"),
      info("zvalue", "zvalue(x, y, bits) - Morton bit-interleave of two non-negative BIGINTs, bits bits each (the z-order layout curve); bits must be an integer literal in [1, 31]."),
      (args: Seq[Expression]) => args(2) match {
        case Literal(b: Int, IntegerType) if b >= 1 && b <= 31 =>
          ZValue(Cast(args(0), LongType), Cast(args(1), LongType), b)
        case other => throw new IllegalArgumentException(
          s"zvalue: bits must be an integer literal in [1, 31], got $other")
      }),
    (FunctionIdentifier("zvalue3"),
      info("zvalue3", "zvalue3(x, y, z, bits) - 3-D Morton bit-interleave of three non-negative BIGINTs, bits bits each; bits must be an integer literal in [1, 20]."),
      (args: Seq[Expression]) => args(3) match {
        case Literal(b: Int, IntegerType) if b >= 1 && b <= 20 =>
          ZValue3(Cast(args(0), LongType), Cast(args(1), LongType),
            Cast(args(2), LongType), b)
        case other => throw new IllegalArgumentException(
          s"zvalue3: bits must be an integer literal in [1, 20], got $other")
      }),
    (FunctionIdentifier("hvalue"),
      info("hvalue", "hvalue(x, y, bits) - Hilbert-curve distance of cell (x, y) on the 2^bits grid (the no-diagonal-jumps layout curve); bits must be an integer literal in [1, 31]."),
      (args: Seq[Expression]) => args(2) match {
        case Literal(b: Int, IntegerType) if b >= 1 && b <= 31 =>
          HilbertValue(Cast(args(0), LongType), Cast(args(1), LongType), b)
        case other => throw new IllegalArgumentException(
          s"hvalue: bits must be an integer literal in [1, 31], got $other")
      }),
    (FunctionIdentifier("cdc_bounds"),
      info("cdc_bounds", "cdc_bounds(text, w, mod) - 1-based content-defined chunk boundary positions (Gear rolling hash of the trailing w-gram ≡ 0 mod mod); w and mod must be integer literals."),
      (args: Seq[Expression]) => (args(1), args(2)) match {
        case (Literal(w: Int, IntegerType), Literal(m: Int, IntegerType))
            if w >= 1 && m >= 1 =>
          CdcBounds(Cast(args(0), StringType), w, m)
        case other => throw new IllegalArgumentException(
          s"cdc_bounds: w and mod must be positive integer literals, got $other")
      }),
    (FunctionIdentifier("span_keep"),
      info("span_keep", "span_keep(w, starts, ends) - elements of array<string> w whose 0-based index lies in none of the sorted disjoint [starts_k, ends_k] ranges."),
      (args: Seq[Expression]) => SpanKeep(
        Cast(args(0), ArrayType(StringType)),
        Cast(args(1), ArrayType(IntegerType)),
        Cast(args(2), ArrayType(IntegerType)))),
    (FunctionIdentifier("feature_hash"),
      info("feature_hash", "feature_hash(hs, dim) - hashing-trick signed bucket counts over array<bigint>; dim must be an integer literal."),
      (args: Seq[Expression]) => args(1) match {
        case Literal(d: Int, IntegerType) => FeatureHash(Cast(args(0), ArrayType(LongType)), d)
        case other => throw new IllegalArgumentException(
          s"feature_hash: dim must be an integer literal, got $other")
      }),
    // Membership probe against a serialized Spark BloomFilter sketch
    // (org.apache.spark.util.sketch.BloomFilter.writeTo bytes). The value
    // is hashed with XxHash64(seed 42) — the same wrapper the sketch
    // builder applies before putLong — so `bloom_might_contain(bits, v)`
    // is Spark's own runtime-filter probe exposed as a callable function
    // (DedupOps.contaminationBloom pre-filters the corpus with it before
    // the exact semi-join).
    (FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(bits, v) - true if the serialized bloom filter may contain xxhash64(v)."),
      (args: Seq[Expression]) =>
        BloomFilterMightContain(args(0), XxHash64(Seq(args(1)), 42L))),
    // Redshift JSON surface (SURVEY §2.2 JSON 🔧) over Spark's JSON-path
    // machinery. Path elements compose into a `$.k1.k2` JSONPath — keys
    // containing '.' or quotes would need bracket syntax and are not
    // supported (documented divergence). A trailing boolean
    // `null_if_invalid` arg is accepted and dropped: GetJsonObject is
    // always null-on-invalid, which IS the null_if_invalid=true behavior.
    (FunctionIdentifier("json_extract_path_text"),
      info("json_extract_path_text",
        "json_extract_path_text(json, k1[, k2, ...][, null_if_invalid]) - value at path $.k1.k2..."),
      (args: Seq[Expression]) => {
        val path = args.tail.filterNot {
          case Literal(_, BooleanType) => true
          case _ => false
        }
        GetJsonObject(args.head, Concat(
          Literal("$") +: path.flatMap(k => Seq(Literal("."), Cast(k, StringType)))))
      }),
    (FunctionIdentifier("json_extract_array_element_text"),
      info("json_extract_array_element_text",
        "json_extract_array_element_text(json, idx[, null_if_invalid]) - array element at 0-based idx."),
      (args: Seq[Expression]) => GetJsonObject(args.head,
        Concat(Seq(Literal("$["), Cast(args(1), StringType), Literal("]"))))),
    // GetJsonObject returns NULL both for invalid JSON and for the valid
    // JSON literal `null` — the bare literals are special-cased so
    // is_valid_json('null') is true like Redshift's (ADVICE r4).
    (FunctionIdentifier("is_valid_json"),
      info("is_valid_json", "is_valid_json(s) - true iff s parses as JSON."),
      (args: Seq[Expression]) => Or(
        In(StringTrim(Cast(args.head, StringType)),
          Seq(Literal("null"), Literal("true"), Literal("false"))),
        IsNotNull(GetJsonObject(args.head, Literal("$"))))),
    (FunctionIdentifier("is_valid_json_array"),
      info("is_valid_json_array", "is_valid_json_array(s) - true iff s parses as a JSON array."),
      (args: Seq[Expression]) => IsNotNull(LengthOfJsonArray(args.head))),
    // Remaining Redshift string-function names with no Spark equivalent
    // name (SURVEY §2.2 string row).
    (FunctionIdentifier("replicate"),
      info("replicate", "replicate(str, n) - str repeated n times."),
      (args: Seq[Expression]) => StringRepeat(args(0), args(1))),
    (FunctionIdentifier("textlen"),
      info("textlen", "textlen(str) - length of str."),
      (args: Seq[Expression]) => Length(args.head)),
    (FunctionIdentifier("strtol"),
      info("strtol", "strtol(str, base) - parse str in the given base to BIGINT."),
      (args: Seq[Expression]) =>
        Cast(Conv(args(0), Cast(args(1), IntegerType), Literal(10)), LongType)),
    (FunctionIdentifier("quote_literal"),
      info("quote_literal", "quote_literal(x) - x as a single-quoted SQL literal, quotes doubled."),
      (args: Seq[Expression]) => Concat(Seq(Literal("'"),
        StringReplace(Cast(args.head, StringType), Literal("'"), Literal("''")),
        Literal("'")))),
    (FunctionIdentifier("quote_ident"),
      info("quote_ident", "quote_ident(x) - x as a double-quoted SQL identifier, quotes doubled."),
      (args: Seq[Expression]) => Concat(Seq(Literal("\""),
        StringReplace(Cast(args.head, StringType), Literal("\""), Literal("\"\"")),
        Literal("\"")))),
    (FunctionIdentifier("bpcharcmp"),
      info("bpcharcmp", "bpcharcmp(a, b) - -1/0/1 string comparison; NULL if either is NULL."),
      (args: Seq[Expression]) =>
        If(Or(IsNull(args(0)), IsNull(args(1))), Literal.create(null, IntegerType),
          CaseWhen(Seq(
            (LessThan(args(0), args(1)), Literal(-1)),
            (GreaterThan(args(0), args(1)), Literal(1))), Literal(0)))),
    // Redshift HLLSKETCH surface (SURVEY §2.2 🔴 → done) over Spark's
    // Apache DataSketches expressions. The materialized sketch is a
    // DataSketches HLL buffer in a BINARY column (Redshift's own sketch
    // wire format is proprietary — the OPERATIONS are equivalent, the
    // bytes are not; documented divergence). Sketches are mergeable
    // across groups/partitions with hll_combine, which is the property
    // that matters at 100 TB: pre-aggregate per partition/day, union
    // later, never rescan.
    (FunctionIdentifier("hll"),
      info("hll", "hll(expr) - approximate distinct cardinality of expr (HyperLogLog++)."),
      (args: Seq[Expression]) => new HyperLogLogPlusPlus(args.head)),
    (FunctionIdentifier("hll_create_sketch"),
      info("hll_create_sketch", "hll_create_sketch(expr) - aggregate expr into a binary HLL sketch."),
      (args: Seq[Expression]) => new HllSketchAgg(args.head)),
    (FunctionIdentifier("hll_cardinality"),
      info("hll_cardinality", "hll_cardinality(sketch) - estimated distinct count of a sketch."),
      (args: Seq[Expression]) => HllSketchEstimate(args.head)),
    (FunctionIdentifier("hll_combine"),
      info("hll_combine", "hll_combine(sketch) - aggregate-union of HLL sketches."),
      (args: Seq[Expression]) => new HllUnionAgg(args.head)),
    // Redshift SUPER surface (SURVEY §2.2 🔴 → done) over Spark 4 Variant:
    // JSON_PARSE → parse_json (VariantType); navigation is native
    // (`v:a.b[0]` / variant_get); JSON_SERIALIZE → cast back to JSON text.
    (FunctionIdentifier("json_parse"),
      info("json_parse", "json_parse(s) - parse JSON text into a VARIANT (Redshift SUPER)."),
      (args: Seq[Expression]) => ParseJson(args.head, failOnError = true)),
    (FunctionIdentifier("json_serialize"),
      info("json_serialize", "json_serialize(v) - serialize a VARIANT back to JSON text."),
      (args: Seq[Expression]) => Cast(args.head, StringType)),
    // Redshift array-over-SUPER function names (SURVEY §2.2 array 🔧 row).
    (FunctionIdentifier("array_concat"),
      info("array_concat", "array_concat(a, b, ...) - concatenate arrays."),
      (args: Seq[Expression]) => Concat(args)),
    (FunctionIdentifier("array_flatten"),
      info("array_flatten", "array_flatten(a) - flatten an array of arrays one level."),
      (args: Seq[Expression]) => org.apache.spark.sql.catalyst.expressions.Flatten(args.head)),
    (FunctionIdentifier("get_array_length"),
      info("get_array_length", "get_array_length(a) - number of elements, as BIGINT."),
      (args: Seq[Expression]) => Cast(Size(args.head), LongType)),
    (FunctionIdentifier("split_to_array"),
      info("split_to_array", "split_to_array(s[, delim]) - split on a LITERAL delimiter (default ','), Redshift arg order."),
      (args: Seq[Expression]) =>
        StringSplitSQL(args.head, args.lift(1).getOrElse(Literal(",")))),
    (FunctionIdentifier("subarray"),
      info("subarray", "subarray(a, start, len) - len elements from 0-based start (Redshift indexing)."),
      (args: Seq[Expression]) =>
        Slice(args(0), Add(Cast(args(1), IntegerType), Literal(1)), Cast(args(2), IntegerType))),
    // Redshift TRUNC is polymorphic; Spark's trunc is date-only. Dispatch
    // prefers the RESOLVED argument type: a date/timestamp first arg takes
    // the date path (single-arg TRUNC(timestamp) → DATE, like Redshift; a
    // string format — literal or not — → TruncDate); everything else
    // truncates toward zero numerically.
    (FunctionIdentifier("trunc"),
      info("trunc", "trunc(ts) - truncate to date; trunc(date, 'fmt') - date truncation; trunc(x[, scale]) - numeric truncation toward zero."),
      (args: Seq[Expression]) => {
        def isDatish(e: Expression) = e.resolved && (e.dataType match {
          case DateType | TimestampType | TimestampNTZType => true
          case _ => false
        })
        def isStringish(e: Expression) = e.resolved && e.dataType == StringType
        args match {
          case Seq(x, fmt @ Literal(_, StringType)) => TruncDate(x, fmt)
          case Seq(x, fmt) if isDatish(x) || isStringish(fmt) => TruncDate(x, fmt)
          case Seq(x, scale) =>
            val s = Pow(Literal(10.0), Cast(scale, DoubleType))
            Divide(Cast(Cast(Multiply(Cast(x, DoubleType), s), LongType), DoubleType), s)
          case Seq(x) if isDatish(x) => Cast(x, DateType)
          case Seq(x) => Cast(Cast(x, LongType), DoubleType)
        }
      }),
    // Legacy Redshift double-precision math aliases and comparators —
    // trivial mappings, registered so pass-through SQL using them resolves.
    (FunctionIdentifier("dexp"),
      info("dexp", "dexp(x) - e^x (legacy Redshift alias of exp)."),
      (args: Seq[Expression]) => Exp(Cast(args.head, DoubleType))),
    (FunctionIdentifier("dlog1"),
      info("dlog1", "dlog1(x) - natural log (legacy Redshift alias of ln)."),
      (args: Seq[Expression]) => Log(Cast(args.head, DoubleType))),
    (FunctionIdentifier("dlog10"),
      info("dlog10", "dlog10(x) - base-10 log (legacy Redshift alias)."),
      (args: Seq[Expression]) => Log10(Cast(args.head, DoubleType))),
    (FunctionIdentifier("func_sha1"),
      info("func_sha1", "func_sha1(x) - SHA-1 hex digest (Redshift alias of sha1)."),
      (args: Seq[Expression]) => Sha1(Cast(args.head, BinaryType))),
    // NULL on either side propagates to NULL (Redshift scalar semantics)
    // rather than falling through CaseWhen's ELSE into a spurious 0.
    (FunctionIdentifier("date_cmp"),
      info("date_cmp", "date_cmp(a, b) - -1/0/1 comparison of two dates; NULL if either is NULL."),
      (args: Seq[Expression]) => {
        val (a, b) = (Cast(args(0), DateType), Cast(args(1), DateType))
        If(Or(IsNull(a), IsNull(b)), Literal.create(null, IntegerType),
          CaseWhen(Seq((LessThan(a, b), Literal(-1)),
            (GreaterThan(a, b), Literal(1))), Literal(0)))
      }),
    (FunctionIdentifier("timestamp_cmp"),
      info("timestamp_cmp", "timestamp_cmp(a, b) - -1/0/1 comparison of two timestamps; NULL if either is NULL."),
      (args: Seq[Expression]) => {
        val (a, b) = (Cast(args(0), TimestampType), Cast(args(1), TimestampType))
        If(Or(IsNull(a), IsNull(b)), Literal.create(null, IntegerType),
          CaseWhen(Seq((LessThan(a, b), Literal(-1)),
            (GreaterThan(a, b), Literal(1))), Literal(0)))
      }),
    // Redshift VARBYTE conversion surface (VERDICT r3 gap #2): VARBYTE maps
    // to BinaryType (SURVEY §1.2); these are the string↔bytes codecs.
    // Redshift emits lowercase hex; Spark's Hex is uppercase, hence Lower.
    (FunctionIdentifier("to_varbyte"),
      info("to_varbyte", "to_varbyte(str, 'hex'|'base64'|'utf8') - decode str into BINARY (Redshift VARBYTE)."),
      (args: Seq[Expression]) => args(1) match {
        case Literal(fmt, StringType) => fmt.toString.toLowerCase match {
          case "hex" => Unhex(args.head)
          case "base64" => UnBase64(args.head)
          case "utf8" | "utf-8" => Cast(args.head, BinaryType)
          case other => throw new IllegalArgumentException(
            s"to_varbyte: unsupported format '$other' (hex|base64|utf8)")
        }
        case _ => throw new IllegalArgumentException(
          "to_varbyte: format must be a string literal")
      }),
    (FunctionIdentifier("from_varbyte"),
      info("from_varbyte", "from_varbyte(bytes, 'hex'|'base64'|'utf8') - encode BINARY as text."),
      (args: Seq[Expression]) => args(1) match {
        case Literal(fmt, StringType) => fmt.toString.toLowerCase match {
          case "hex" => Lower(Hex(args.head))
          case "base64" => Base64(args.head)
          case "utf8" | "utf-8" => Cast(args.head, StringType)
          case other => throw new IllegalArgumentException(
            s"from_varbyte: unsupported format '$other' (hex|base64|utf8)")
        }
        case _ => throw new IllegalArgumentException(
          "from_varbyte: format must be a string literal")
      }),
    // STRTOL(str, base) — Redshift's radix parser; Conv re-bases to
    // decimal, the Cast yields the BIGINT Redshift returns.
    (FunctionIdentifier("strtol"),
      info("strtol", "strtol(str, base) - bigint value of str interpreted in the given base."),
      (args: Seq[Expression]) =>
        Cast(Conv(Cast(args(0), StringType), args(1), Literal(10)), LongType)),
    (FunctionIdentifier("date_part_year"),
      info("date_part_year", "date_part_year(date) - the year of date (Redshift shorthand)."),
      (args: Seq[Expression]) => Year(Cast(args(0), DateType))),
    // captured at analysis time — each statement re-analyzes, so the
    // value is the count as of THIS query, matching Redshift's session fn
    (FunctionIdentifier("pg_last_copy_count"),
      info("pg_last_copy_count",
        "pg_last_copy_count() - rows loaded by the most recent COPY (0 before any)."),
      (_: Seq[Expression]) => Literal(LocalCopy.lastCopyCount)),
    // r8 dialect sweep: the remaining Redshift scalar names with no
    // same-name Spark builtin (SURVEY §2.2 string/date/JSON rows).
    (FunctionIdentifier("to_hex"),
      info("to_hex", "to_hex(n) - lowercase hex of an integer (Redshift emits lowercase)."),
      (args: Seq[Expression]) => Lower(Hex(Cast(args.head, LongType)))),
    (FunctionIdentifier("json_array_length"),
      info("json_array_length",
        "json_array_length(json[, null_if_invalid]) - length of a JSON array; NULL if invalid."),
      (args: Seq[Expression]) => LengthOfJsonArray(args.head)),
    // Positional match count of the two 4-char American Soundex codes
    // (Redshift/SQL-Server DIFFERENCE, 0-4). Empty positions never match,
    // so non-soundexable inputs score 0, and NULL propagates.
    (FunctionIdentifier("difference"),
      info("difference", "difference(a, b) - matching positions of soundex(a) and soundex(b), 0-4."),
      (args: Seq[Expression]) => {
        val (sa, sb) = (SoundEx(Cast(args(0), StringType)), SoundEx(Cast(args(1), StringType)))
        def m(i: Int): Expression = {
          val (ca, cb) = (Substring(sa, Literal(i), Literal(1)),
            Substring(sb, Literal(i), Literal(1)))
          If(And(And(EqualTo(ca, cb), GreaterThan(Length(ca), Literal(0))),
            GreaterThan(Length(cb), Literal(0))), Literal(1), Literal(0))
        }
        If(Or(IsNull(args(0)), IsNull(args(1))), Literal.create(null, IntegerType),
          Seq(1, 2, 3, 4).map(m).reduceLeft[Expression]((a, b) => Add(a, b)))
      }),
    (FunctionIdentifier("date_cmp_timestamp"),
      info("date_cmp_timestamp",
        "date_cmp_timestamp(d, ts) - -1/0/1 comparison of a date against a timestamp; NULL if either is NULL."),
      (args: Seq[Expression]) => tsCmp(Cast(args(0), TimestampType), Cast(args(1), TimestampType))),
    (FunctionIdentifier("timestamp_cmp_date"),
      info("timestamp_cmp_date",
        "timestamp_cmp_date(ts, d) - -1/0/1 comparison of a timestamp against a date; NULL if either is NULL."),
      (args: Seq[Expression]) => tsCmp(Cast(args(0), TimestampType), Cast(args(1), TimestampType))),
    // Byte (not character) index of sub in s, 1-based; 0 when absent —
    // locate the char position, then measure the prefix in octets.
    (FunctionIdentifier("octetindex"),
      info("octetindex", "octetindex(sub, s) - 1-based BYTE offset of sub in s; 0 if absent."),
      (args: Seq[Expression]) => {
        val p = StringLocate(Cast(args(0), StringType), Cast(args(1), StringType), Literal(1))
        If(EqualTo(p, Literal(0)), Literal(0),
          Add(OctetLength(Substring(Cast(args(1), StringType), Literal(1),
            Add(p, Literal(-1)))), Literal(1)))
      }),
    (FunctionIdentifier("timeofday"),
      info("timeofday", "timeofday() - current timestamp as a Redshift-style text string."),
      (_: Seq[Expression]) => DateFormatClass(CurrentTimestamp(),
        Literal("EEE MMM dd HH:mm:ss.SSSSSS zz yyyy")))
  )

  /** Shared -1/0/1 comparator with NULL-propagation (the *_cmp family). */
  private def tsCmp(a: Expression, b: Expression): Expression =
    If(Or(IsNull(a), IsNull(b)), Literal.create(null, IntegerType),
      CaseWhen(Seq((LessThan(a, b), Literal(-1)),
        (GreaterThan(a, b), Literal(1))), Literal(0)))
}
