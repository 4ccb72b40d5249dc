package graft.core

import java.text.Normalizer
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization kernel for the [[graft.functions.NfcNormalize]]
  * Catalyst expression. Static entry so whole-stage codegen can call it
  * directly (same pattern as [[ZOrder.interleave]]).
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan (quick-check
  * properties) and virtually all real corpus text is already NFC — in
  * that case the input UTF8String is returned as-is, zero allocation.
  * Only strings that actually contain decomposed sequences pay the
  * String round-trip.
  */
object UnicodeNorm {
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }

  def nfkc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFKC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFKC))
  }
}
