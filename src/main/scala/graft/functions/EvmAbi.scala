package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generalized EVM event-ABI decoder.
  *
  * The reference decodes *arbitrary* event signatures data-driven
  * (cherry_pipelines/evm/erc20_transfers.py:131-141,
  * `EvmDecodeEventsConfig(event_signature="Transfer(address indexed from,
  * address indexed to, uint256 amount)", allow_decode_fail=True)`): indexed
  * params are read from topics 1..3 in order, non-indexed params from the
  * 32-byte words of the data blob, and a row that does not match the
  * expected shape decodes to NULLs instead of failing the job (needed
  * because e.g. ERC-721 Transfer shares topic0 with ERC-20 Transfer but
  * carries its third param indexed — 4 topics, empty data).
  *
  * Spark-first design: `parseEvent` turns the signature string into a
  * typed layout once at plan time, and `decodeEvent` emits one pure
  * `Column` expression per parameter — substring/hex/conditionals plus the
  * existing codegen'd u256 expressions. The whole decode is a single
  * projection; nothing is interpreted per row, no UDFs.
  */
object EvmAbi {

  sealed trait AbiType { def canonical: String }
  case object TAddress extends AbiType { val canonical = "address" }
  final case class TUint(bits: Int) extends AbiType { def canonical = s"uint$bits" }
  /** Signed two's-complement intN (Uniswap-V3-style Swap carries int256
    * amounts). */
  final case class TInt(bits: Int) extends AbiType { def canonical = s"int$bits" }
  case object TBool extends AbiType { val canonical = "bool" }
  final case class TBytesFixed(n: Int) extends AbiType { def canonical = s"bytes$n" }
  /** An INDEXED dynamic type (string/bytes/array): the topic holds the
    * keccak hash of the value, which we surface as hex. */
  final case class TDynamic(canonical: String) extends AbiType
  /** A NON-indexed string/bytes param, decoded from the data blob's tail:
    * the head word holds a byte offset, the tail holds a 32-byte length
    * word followed by the zero-padded payload. */
  final case class TDynBytes(isString: Boolean) extends AbiType {
    def canonical = if (isString) "string" else "bytes"
  }
  /** A NON-indexed dynamic array `T[]` of a STATIC element type: head word
    * = offset, tail = length word + one 32-byte word per element. (Nested
    * dynamic element types are rejected at parse time.) */
  final case class TArray(elem: AbiType) extends AbiType {
    def canonical = elem.canonical + "[]"
  }

  private def isDynamic(t: AbiType): Boolean = t match {
    case TDynBytes(_) | TArray(_) => true
    case _ => false
  }

  final case class Param(name: String, typ: AbiType, indexed: Boolean)

  final case class EventSig(event: String, params: Seq[Param]) {
    def indexedParams: Seq[Param] = params.filter(_.indexed)
    def dataParams: Seq[Param] = params.filterNot(_.indexed)
    /** Canonical signature, e.g. "Transfer(address,address,uint256)" —
      * names and `indexed` markers stripped, aliases normalized. */
    def canonical: String =
      s"$event(${params.map(_.typ.canonical).mkString(",")})"
    /** keccak256 of the canonical signature = the log's topic0, lowercase
      * hex. Computed once at plan time (driver side). */
    lazy val topic0Hex: String =
      Keccak.hash256(canonical.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
  }

  private def unsupported(t: String): Nothing =
    throw new IllegalArgumentException(s"unsupported ABI type '$t'")

  private def parseType(s: String, indexed: Boolean): AbiType = s match {
    case t if t.endsWith("[]") =>
      val elem = parseType(t.dropRight(2), indexed = false)
      // an indexed array's topic is the hash of the encoding — same
      // surface as indexed string/bytes
      if (indexed) TDynamic(elem.canonical + "[]")
      else elem match {
        case e if isDynamic(e) || e.isInstanceOf[TDynamic] =>
          unsupported(t) // nested dynamic (string[], bytes[][], …)
        case e => TArray(e)
      }
    // tuples (and fixed-size arrays) would otherwise fall into the
    // uintN/bytesN width parse below and surface as NumberFormatException
    case t if t.contains("(") || t.contains("[") => unsupported(t)
    case "address" => TAddress
    case "bool"    => TBool
    case "uint"    => TUint(256)
    case t if t.startsWith("uint") =>
      val bits = t.drop(4).toIntOption.getOrElse(unsupported(t))
      require(bits % 8 == 0 && bits > 0 && bits <= 256, s"bad uint width: $t")
      TUint(bits)
    case "bytes" | "string" =>
      // non-indexed dynamics decode from the data tail (TDynBytes);
      // indexed ones surface the topic hash (TDynamic)
      if (indexed) TDynamic(s) else TDynBytes(s == "string")
    case t if t.startsWith("bytes") =>
      val n = t.drop(5).toIntOption.getOrElse(unsupported(t))
      require(n >= 1 && n <= 32, s"bad bytesN width: $t")
      TBytesFixed(n)
    case "int" => TInt(256)
    case t if t.startsWith("int") =>
      val bits = t.drop(3).toIntOption.getOrElse(unsupported(t))
      require(bits % 8 == 0 && bits > 0 && bits <= 256, s"bad int width: $t")
      TInt(bits)
    case other => unsupported(other)
  }

  /** Parse a human-readable event signature. Accepts both the full form
    * with names and indexed markers ("Transfer(address indexed from,
    * address indexed to, uint256 amount)") and the canonical form
    * ("Transfer(address,address,uint256)" — params then named p0, p1, …
    * and treated as non-indexed). */
  def parseEvent(sig: String): EventSig = {
    val open = sig.indexOf('(')
    require(open > 0 && sig.endsWith(")"), s"malformed event signature: $sig")
    val name = sig.substring(0, open).trim
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"malformed event name in: $sig")
    val inner = sig.substring(open + 1, sig.length - 1).trim
    val params =
      if (inner.isEmpty) Seq.empty[Param]
      else inner.split(",").toSeq.zipWithIndex.map { case (raw, i) =>
        val toks = raw.trim.split("\\s+").toSeq
        val indexed = toks.contains("indexed")
        val rest = toks.filterNot(_ == "indexed")
        require(rest.nonEmpty, s"empty parameter in: $sig")
        val typ = parseType(rest.head, indexed)
        val pname = if (rest.size > 1) rest.last else s"p$i"
        Param(pname, typ, indexed)
      }
    require(params.count(_.indexed) <= 3,
      s"more than 3 indexed params in: $sig (EVM logs carry topics 1..3)")
    EventSig(name, params)
  }

  /** ABI well-formedness of one 32-byte word for its declared type,
    * folded into the allow_decode_fail guard: the reference decoder
    * validates padding and fails the row rather than silently
    * truncating — a uint8 word with nonzero high bytes is a different
    * event, not a value. uintN / address are right-aligned (leading
    * zeros); bytesN is left-aligned (trailing zeros); bool must be 0 or
    * 1. (Unused on the allowDecodeFail=false trusted-input path.) */
  private def wordOk(word: Column, typ: AbiType): Column = {
    def zeros(n: Int) = lit(Array.fill[Byte](n)(0))
    typ match {
      case TAddress => substring(word, 1, 12) === zeros(12)
      case TUint(bits) if bits < 256 =>
        substring(word, 1, 32 - bits / 8) === zeros(32 - bits / 8)
      case TUint(_) => lit(true)
      case TInt(bits) if bits < 256 =>
        // proper sign extension: leading bytes all 0x00 with a clear sign
        // bit, or all 0xff with a set one (binary compare is unsigned)
        val k = 32 - bits / 8
        val lead = substring(word, 1, k)
        val signByte = substring(word, k + 1, 1)
        (lead === zeros(k) && signByte < lit(Array(0x80.toByte))) ||
          (lead === lit(Array.fill[Byte](k)(0xff.toByte)) &&
            signByte >= lit(Array(0x80.toByte)))
      case TInt(_) => lit(true)
      case TBool =>
        substring(word, 1, 31) === zeros(31) &&
          (substring(word, 32, 1) === lit(Array[Byte](0)) ||
            substring(word, 32, 1) === lit(Array[Byte](1)))
      case TBytesFixed(n) if n < 32 =>
        substring(word, n + 1, 32 - n) === zeros(32 - n)
      case TBytesFixed(_) => lit(true)
      case TDynamic(_) => lit(true) // topic holds a hash — any bytes valid
      // head word of a tail-encoded param is an offset; its bounds are
      // validated by decodeDynamic, not by word padding
      case TDynBytes(_) | TArray(_) => lit(true)
    }
  }

  /** The decoded Spark column for one 32-byte word. */
  private def decodeWord(word: Column, typ: AbiType): Column = typ match {
    // try_cast, not cast: on the unguarded allowDecodeFail=false path an
    // out-of-range word must yield null, not an ANSI CAST_OVERFLOW abort
    // (the guarded path's padding checks make the cast provably safe)
    case TAddress       => lower(hex(substring(word, 13, 20)))
    case TUint(bits) if bits <= 63 => u256_to_decimal(word).try_cast(LongType)
    case TUint(_)       => u256_to_decimal(word) // Decimal(38,0); null > 38 digits
    case TInt(bits) if bits <= 64 => s256_to_decimal(word).try_cast(LongType)
    case TInt(_)        => s256_to_decimal(word)
    case TBool          => u256_to_decimal(word) =!= lit(BigDecimal(0))
    case TBytesFixed(n) => substring(word, 1, n)
    case TDynamic(_)    => lower(hex(word)) // keccak hash of the value
    case TDynBytes(_) | TArray(_) =>
      throw new IllegalStateException("dynamic params decode via decodeDynamic")
  }

  /** Tail decode for one non-indexed dynamic param (`string`, `bytes`,
    * `T[]`): the head word holds a byte offset into the data blob; the
    * tail there is a 32-byte length word followed by the payload (zero-
    * padded to a word boundary for string/bytes; one word per element for
    * arrays). Returns (value, validity).
    *
    * The VALUE side clamps the element count to what the blob can
    * physically hold, so the trusted (allowDecodeFail=false) path yields
    * garbage — never an error — on malformed input, matching the static
    * decoders. The VALIDITY side pins what the reference decoder enforces:
    * 32-aligned offset pointing past the head, length word in bounds,
    * tail fully inside the blob, zero padding.
    */
  private def decodeDynamic(data: Column, head: Column, typ: AbiType,
      headBytes: Int): (Column, Column) = {
    val len = length(data).cast(LongType)
    val off = u256_to_decimal(head).try_cast(LongType)
    // EVERY expression here must be total — SQL AND does not short-circuit
    // per row, and substr's implicit long→int position cast throws under
    // ANSI on out-of-range values. So the raw off/n feed only pure-long
    // comparisons (boundsOk), while anything that touches substr uses
    // clamped twins that provably stay within the blob: garbage input
    // yields garbage values (nulled by `valid` on the guarded path),
    // never an error.
    val offV = least(coalesce(off, lit(Long.MaxValue)), len)
    val clampPos: Column => Column = p => least(p, len + lit(1L))
    val n = u256_to_decimal(substr(data, offV + lit(1L), lit(32L)))
      .try_cast(LongType)
    val nV = least(greatest(coalesce(n, lit(Long.MaxValue)), lit(0L)), len)
    // ceil(nV/32)*32 in exact long math (32 = 2^5); computed on the
    // CLAMPED length — raw off/n can sit at Long.MaxValue where even +31
    // overflows under ANSI, so they only ever feed pure comparisons, and
    // the comparisons pin offV === off, nV === n wherever validity holds
    val paddedV = shiftleft(shiftright(nV + lit(31L), 5), 5)
    // tail size is TYPE-dependent: string/bytes hold n BYTES padded to a
    // word boundary; an array holds n WORDS (32·n bytes). Using the byte
    // formula for arrays would accept truncated blobs and fabricate
    // zero elements.
    val tailBytesV = typ match {
      case TArray(_) => shiftleft(nV, 5)
      case _         => paddedV
    }
    val boundsOk = off.isNotNull && pmod(off, lit(32L)) === 0 &&
      off >= lit(headBytes.toLong) && off <= len &&
      n.isNotNull && n >= 0 && n <= len && offV + lit(32L) + tailBytesV <= len
    typ match {
      case TDynBytes(isString) =>
        val payload = substr(data, clampPos(offV + lit(33L)), nV)
        val value = if (isString) payload.cast(StringType) else payload
        val padLenV = paddedV - nV
        val padOk = substr(data, clampPos(offV + lit(33L) + nV), padLenV) ===
          substr(lit(Array.fill[Byte](32)(0)), lit(1L), padLenV)
        (value, boundsOk && padOk)
      case TArray(elem) =>
        // the blob holds at most len/32 words — a garbage length word on
        // the unguarded path builds a bounded array, never an OOM
        val nArr = least(nV, shiftright(len, 5))
        val rawWords = when(nArr > 0,
            transform(sequence(lit(0L), nArr - 1),
              i => substr(data, clampPos(offV + lit(33L) + i * 32), lit(32L))))
          .otherwise(array().cast(ArrayType(BinaryType)))
        val value = transform(rawWords, w => decodeWord(w, elem))
        val elemsOk = forall(rawWords, w => wordOk(w, elem))
        (value, boundsOk && n === nArr && elemsOk)
      case other =>
        throw new IllegalStateException(s"not a dynamic type: $other")
    }
  }

  private def sparkType(typ: AbiType): DataType = typ match {
    case TAddress        => StringType
    case TUint(b) if b <= 63 => LongType
    case TUint(_)        => DecimalType(38, 0)
    case TInt(b) if b <= 64 => LongType
    case TInt(_)         => DecimalType(38, 0)
    case TBool           => BooleanType
    case TBytesFixed(_)  => BinaryType
    case TDynamic(_)     => StringType
    case TDynBytes(s)    => if (s) StringType else BinaryType
    case TArray(e)       => ArrayType(sparkType(e))
  }

  /** Append one decoded column per event parameter (named after the
    * parameter) to `df`.
    *
    * `allowDecodeFail = true` (the reference default for shared-topic0
    * scans) nulls ALL decoded columns on any shape mismatch: wrong topic0,
    * a missing/short topic the layout needs, an unexpected extra topic
    * (only checked when that topic column exists in `df`), or a data blob
    * whose length is not exactly 32 × (non-indexed param count) — with
    * dynamic params, a blob that is too short for the head, not word-
    * aligned, or whose tail offsets/lengths/padding violate the encoding.
    * `allowDecodeFail = false` is the trusted-input fast path: NO guard
    * runs — neither shape nor padding checks — and the per-word decode
    * never throws, so malformed input yields garbage, not errors. (The
    * reference's allow_decode_fail=False aborts the job instead; a pure
    * Column plan cannot abort, so callers who need strictness keep the
    * default and filter on a decoded column's nullness.)
    */
  def decodeEvent(df: DataFrame, signature: String,
      allowDecodeFail: Boolean = true,
      topicCols: Seq[String] = Seq("topic0", "topic1", "topic2", "topic3"),
      dataCol: String = "data"): DataFrame = {
    val sig = parseEvent(signature)
    val present = df.columns.toSet
    // decoded columns are appended under the params' names — a collision
    // with an input column (a param named 'data' or 'topic1') would yield
    // duplicate names and ambiguous references downstream
    val clash = sig.params.map(_.name).filter(present.contains)
    require(clash.isEmpty, "event param name(s) " +
      clash.mkString("'", "', '", "'") +
      s" collide with input columns; rename the params in: $signature")
    require(present.contains(topicCols.head), s"missing ${topicCols.head}")
    require(sig.dataParams.isEmpty || present.contains(dataCol),
      s"missing $dataCol")
    val nIdx = sig.indexedParams.size
    require(topicCols.size >= nIdx + 1,
      s"need ${nIdx + 1} topic columns for $signature")

    val topicOk = (1 to nIdx).map { i =>
      require(present.contains(topicCols(i)),
        s"missing ${topicCols(i)} needed by $signature")
      val t = col(topicCols(i))
      t.isNotNull && length(t) === 32
    }
    // an extra populated topic means a different (more-indexed) event that
    // shares our topic0 — the ERC-721 case the reference guards against
    val extraTopicNull = ((nIdx + 1) until topicCols.size)
      .filter(i => present.contains(topicCols(i)))
      .map(i => col(topicCols(i)).isNull)
    val hasDynamic = sig.dataParams.exists(p => isDynamic(p.typ))
    val headBytes = 32 * sig.dataParams.size
    val dataOk =
      if (sig.dataParams.isEmpty)
        Seq(if (present.contains(dataCol))
              col(dataCol).isNull || length(col(dataCol)) === 0
            else lit(true))
      else if (!hasDynamic) Seq(length(col(dataCol)) === lit(headBytes))
      // with tails the blob is head + variable tails, still word-aligned
      else Seq(length(col(dataCol)) >= lit(headBytes),
        pmod(length(col(dataCol)), lit(32)) === 0)
    val sigOk = lower(hex(col(topicCols.head))) === lit(sig.topic0Hex)

    var idxSeen = 0
    var dataSeen = 0
    val words = sig.params.map { p =>
      if (p.indexed) { idxSeen += 1; col(topicCols(idxSeen)) }
      else { val off = dataSeen * 32; dataSeen += 1
             substring(col(dataCol), off + 1, 32) }
    }
    // per-param (value, validity): static params decode their word with a
    // padding check (a type-violating word means a different event sharing
    // our topic0, not a truncatable value); dynamic params follow their
    // head word's offset into the tail with bounds checks
    val perParam = sig.params.zip(words).map { case (p, w) =>
      if (!p.indexed && isDynamic(p.typ))
        decodeDynamic(col(dataCol), w, p.typ, headBytes)
      else (decodeWord(w, p.typ), wordOk(w, p.typ))
    }
    val valid = (Seq(sigOk) ++ topicOk ++ extraTopicNull ++ dataOk ++
      perParam.map(_._2)).reduce(_ && _)

    val decoded = sig.params.zip(perParam).map { case (p, (c, _)) =>
      val guarded =
        if (allowDecodeFail) when(valid, c).otherwise(lit(null).cast(sparkType(p.typ)))
        else c
      guarded.as(p.name)
    }
    df.select(col("*") +: decoded: _*)
  }

  /** topic0 for a signature — handy for scan-time filters (the analog of
    * the reference's `evm_signature_to_topic0`, erc20_transfers.py:94). */
  def signatureTopic0Hex(signature: String): String =
    parseEvent(signature).topic0Hex

  /** 4-byte function selector: the first 4 bytes of keccak256 of the
    * canonical signature — the calldata analog of topic0. */
  def selectorHex(signature: String): String = {
    val sig = parseEvent(signature)
    require(sig.indexedParams.isEmpty,
      s"function params cannot be indexed: $signature")
    sig.topic0Hex.take(8)
  }

  /** Function-CALLDATA twin of decodeEvent: tx input = 4-byte selector ++
    * the SAME head+tail word encoding events use for their non-indexed
    * data section (ABI §function-selector-and-argument-encoding). Every
    * helper — word decode, padding validity, dynamic-tail bounds — is
    * shared with the event path; the args blob is re-based past the
    * selector so tail offsets (ABI-relative to the args section) line up
    * unchanged. Same allow_decode_fail contract: a wrong selector, bad
    * length, or any type violation nulls the row's decoded columns.
    */
  def decodeFunction(df: DataFrame, signature: String,
      allowDecodeFail: Boolean = true,
      calldataCol: String = "input"): DataFrame = {
    val sig = parseEvent(signature)
    require(sig.indexedParams.isEmpty,
      s"function params cannot be indexed: $signature")
    val present = df.columns.toSet
    val clash = sig.params.map(_.name).filter(present.contains)
    require(clash.isEmpty, "function param name(s) " +
      clash.mkString("'", "', '", "'") +
      s" collide with input columns; rename the params in: $signature")
    require(present.contains(calldataCol), s"missing $calldataCol")
    val cd = col(calldataCol)
    val headBytes = 32 * sig.params.size
    val hasDynamic = sig.params.exists(p => isDynamic(p.typ))
    val argsLen = length(cd) - 4
    val selOk = cd.isNotNull && length(cd) >= 4 &&
      lower(hex(substring(cd, 1, 4))) === lit(sig.topic0Hex.take(8))
    val lenOk =
      if (!hasDynamic) Seq(argsLen === lit(headBytes))
      else Seq(argsLen >= lit(headBytes), pmod(argsLen, lit(32)) === 0)
    val args = cd.substr(lit(5), greatest(argsLen, lit(0)))
    val words = sig.params.indices.map(i => substring(args, i * 32 + 1, 32))
    val perParam = sig.params.zip(words).map { case (p, w) =>
      if (isDynamic(p.typ)) decodeDynamic(args, w, p.typ, headBytes)
      else (decodeWord(w, p.typ), wordOk(w, p.typ))
    }
    val valid = (Seq(selOk) ++ lenOk ++ perParam.map(_._2)).reduce(_ && _)
    val decoded = sig.params.zip(perParam).map { case (p, (c, _)) =>
      val guarded =
        if (allowDecodeFail)
          when(valid, c).otherwise(lit(null).cast(sparkType(p.typ)))
        else c
      guarded.as(p.name)
    }
    df.select(col("*") +: decoded: _*)
  }
}
