package graft.schema

import com.fasterxml.jackson.databind.JsonNode

/** Classifier for MongoDB Extended JSON v2 values (public wire format;
  * the JSON representation of every BSON type in SURVEY.md §1.2).
  */
sealed trait ExtJsonType

object ExtJsonType {
  case object Null extends ExtJsonType
  case object Str extends ExtJsonType
  case object Oid extends ExtJsonType
  case object Uuid extends ExtJsonType
  case object Regex extends ExtJsonType
  case object Int32 extends ExtJsonType
  case object Int64 extends ExtJsonType
  case object Dbl extends ExtJsonType
  case object Dec extends ExtJsonType
  case object Bool extends ExtJsonType
  case object Ts extends ExtJsonType
  case object Bin extends ExtJsonType
  case object Arr extends ExtJsonType
  case object Doc extends ExtJsonType
  /** MinKey/MaxKey: dropped per the type map. */
  case object Skip extends ExtJsonType

  /** Single-key `$wrapper` detection; any other object is a document. */
  def of(n: JsonNode): ExtJsonType = {
    if (n == null || n.isNull) Null
    else if (n.isTextual) Str
    else if (n.isBoolean) Bool
    else if (n.isInt || n.isShort) Int32
    else if (n.isLong || n.isBigInteger) Int64
    else if (n.isFloat || n.isDouble) Dbl
    else if (n.isBigDecimal) Dec
    else if (n.isArray) Arr
    else if (n.isObject) {
      if (n.size() == 1) {
        val key = n.fieldNames().next()
        key match {
          case "$oid" => Oid
          case "$uuid" => Uuid
          case "$regularExpression" => Regex
          case "$numberInt" => Int32
          case "$numberLong" => Int64
          case "$numberDouble" => Dbl
          case "$numberDecimal" => Dec
          case "$date" => Ts
          case "$binary" => Bin
          case "$minKey" | "$maxKey" => Skip
          case "$timestamp" => Ts // BSON internal timestamp → event time
          case _ => Doc
        }
      } else Doc
    } else Str
  }
}
