package graft.core

import java.sql.Timestamp

/** Typed stage contracts of the KG-construction pipeline (SURVEY.md §7.2).
  * Field names are snake_case to match the `input_hint` table schema so
  * `Dataset[T]` encoders line up with the at-rest Parquet columns without
  * renames.
  */

/** One transcript turn — the canonical input row (`input_hint`). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Turn + decoded per-char tags (detect-stage intermediate). */
final case class TaggedTurn(
    conv_id: String,
    turn_idx: Int,
    text: String,
    tags: Seq[String])

/** Detected mention; char offsets, `end` exclusive (label.py:11-44 tuple). */
final case class Mention(
    conv_id: String,
    turn_idx: Int,
    start: Int,
    end: Int,
    label: String,
    surface: String)

/** Mention + linking outcome. `entity_id` null ⇒ NIL (unlinked);
  * `method` ∈ {exact, fuzzy}.
  */
final case class LinkedMention(
    conv_id: String,
    turn_idx: Int,
    start: Int,
    end: Int,
    label: String,
    surface: String,
    entity_id: String,
    method: String)

/** Mention resolved to its canonical entity id (post connected-components). */
final case class CanonMention(
    conv_id: String,
    turn_idx: Int,
    start: Int,
    end: Int,
    label: String,
    surface: String,
    entity_id: String,
    canonical_id: String)

/** Emitted knowledge-graph triple, keyed by provenance (conv_id, turn_idx). */
final case class Triple(
    subj: String,
    pred: String,
    obj: String,
    conv_id: String,
    turn_idx: Int)

/** Alias-dictionary row (entity-linking candidate dictionary; shape mirrors
  * the tagged vocab `tencent_vocab_with_tag.json`, vocab_tag.py:58-71).
  */
final case class AliasRow(surface: String, entity_id: String, label: String)

// Per-stage, per-partition lineage rows live in the parquet metrics table
// written by io.SnapshotIO (stage, snapshot, partition_id, rows) — there is
// deliberately no case-class mirror here; SnapshotIO.metrics returns the
// DataFrame directly.
