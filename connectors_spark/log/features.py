"""Table-feature protocol versioning (Delta protocol spec; reference
actions.scala:31-35 only implements the legacy (1,2) floor).

The engine implements several capabilities beyond the reference's
(1,2) protocol — column mapping, deletion vectors, change data feed,
in-commit timestamps, generated and identity columns. Left at (1,2),
a FOREIGN reader that honours only the legacy protocol would read a
mapped table's physical column names or resurrect DV-deleted rows —
silent wrong answers, exactly what the Delta protocol's version gates
exist to prevent (column mapping ⇒ reader 2, deletion vectors ⇒
reader 3 / table features).

``delta.protocol.autoUpgrade`` (table property, opt-in; default keeps
the reference-parity (1,2) behaviour) makes every commit compute the
protocol its table state REQUIRES and bump the Protocol action when it
grows — so foreign readers fail loudly instead of misreading. The
version map is the published Delta feature table:

    appendOnly / invariants            → (1, 2)
    checkConstraints                   → (1, 3)
    changeDataFeed / generatedColumns  → (1, 4)
    columnMapping                      → (2, 5)
    identityColumns                    → (1, 6)
    deletionVectors                    → (3, 7)   [table features]
    inCommitTimestamp                  → (1, 7)   [table features]

At writer version 7 the protocol must enumerate ``writerFeatures``
(every active feature, legacy ones included); at reader version 3 it
must enumerate ``readerFeatures``. Protocols are monotone: an upgrade
merges component-wise with the current protocol and unions feature
sets, so a feature once required never silently disappears (e.g. a
table that wrote one deletion vector stays reader-3 even after the DV
is compacted away — the historical versions still need it).
"""

from __future__ import annotations

from typing import Iterable, Optional, Set

from .actions import Protocol

# feature name -> (minReaderVersion, minWriterVersion) that implies it
# without listing (the "legacy" encoding); features above (3, 7) are
# only expressible through the feature lists.
FEATURE_VERSIONS = {
    "appendOnly": (1, 2),
    "invariants": (1, 2),
    "checkConstraints": (1, 3),
    "changeDataFeed": (1, 4),
    "generatedColumns": (1, 4),
    "columnMapping": (2, 5),
    "identityColumns": (1, 6),
    "deletionVectors": (3, 7),
    "inCommitTimestamp": (1, 7),
    "domainMetadata": (1, 7),
    "rowTracking": (1, 7),
    "typeWidening": (3, 7),
    "v2Checkpoint": (3, 7),
    "vacuumProtocolCheck": (3, 7),
    "variantType": (3, 7),
}

# Features that have a READER-side obligation (everything else is
# writer-only: a reader can ignore it safely).
READER_FEATURES = {"columnMapping", "deletionVectors", "typeWidening",
                   "v2Checkpoint", "vacuumProtocolCheck",
                   "variantType"}

TABLE_FEATURES_READER_VERSION = 3
TABLE_FEATURES_WRITER_VERSION = 7

# What THIS engine implements. A protocol demanding anything outside
# these sets must be refused (read and write respectively).
SUPPORTED_READER_FEATURES = {"columnMapping", "deletionVectors",
                             "typeWidening", "v2Checkpoint",
                             "vacuumProtocolCheck", "variantType"}
SUPPORTED_WRITER_FEATURES = set(FEATURE_VERSIONS)
MAX_SUPPORTED_READER_VERSION = TABLE_FEATURES_READER_VERSION
MAX_SUPPORTED_WRITER_VERSION = TABLE_FEATURES_WRITER_VERSION


def active_features(meta, extra: Iterable[str] = ()) -> Set[str]:
    """Features the table's CURRENT metadata activates. ``extra``
    carries state not visible in metadata (deletionVectors is per-file:
    the delete that stages the first DV passes it explicitly)."""
    from ..config import TableConfig

    cfg = TableConfig(meta.configuration)
    feats = {"appendOnly", "invariants"}
    feats.update(extra)
    # Explicit feature enablement (delta-spark's ALTER TABLE SET
    # TBLPROPERTIES 'delta.feature.<name>'='supported'): property-keyed
    # opt-in for features with no dedicated config switch (e.g.
    # vacuumProtocolCheck). Unknown names fail the commit loudly —
    # silently accepting a feature this engine can't honour would be
    # the exact interop hazard the gates exist to prevent.
    for key, val in (meta.configuration or {}).items():
        if key.startswith("delta.feature."):
            name = key[len("delta.feature."):]
            if str(val).lower() not in ("supported", "enabled"):
                continue
            if name not in FEATURE_VERSIONS:
                raise ValueError(
                    f"unknown or unsupported table feature {name!r} "
                    f"(supported: {sorted(FEATURE_VERSIONS)})")
            feats.add(name)
    if cfg.check_constraints:
        feats.add("checkConstraints")
    if cfg.enable_change_data_feed:
        feats.add("changeDataFeed")
    if cfg.enable_in_commit_timestamps:
        feats.add("inCommitTimestamp")
    if cfg.checkpoint_policy == "v2":
        feats.add("v2Checkpoint")
    if cfg.enable_type_widening or any(
            (f.metadata or {}).get("delta.typeChanges")
            for f in meta.schema.fields):
        # the feature must PERSIST once any column was ever widened
        # (historical files still carry the narrow physical type), even
        # if the property is later unset
        feats.add("typeWidening")
    if cfg.enable_row_tracking:
        # row ids live in AddFile.baseRowId + the delta.rowTracking
        # high-watermark domain, so the feature depends on
        # domainMetadata (Delta protocol: Row Tracking > Writer
        # Requirements)
        feats.add("rowTracking")
        feats.add("domainMetadata")
    if meta.column_mapping_mode != "none":
        feats.add("columnMapping")
    if any(_has_variant(f.dataType) for f in meta.schema.fields):
        # VARIANT (Delta protocol 'Variant Data Type'): semi-structured
        # values stored as the parquet physical pair
        # (metadata: binary, value: binary) — Spark 4 reads/writes the
        # physical form natively; the protocol gate is the engine's
        # job so legacy readers refuse instead of misreading the
        # binary pair as a plain struct.
        feats.add("variantType")
    for f in meta.schema.fields:
        md = f.metadata or {}
        if md.get("delta.generationExpression"):
            feats.add("generatedColumns")
        if "delta.identity.start" in md:
            feats.add("identityColumns")
    return feats


def _has_variant(dt) -> bool:
    """True when ``dt`` contains a VariantType anywhere (nested
    structs/arrays/maps included)."""
    from pyspark.sql import types as T
    if isinstance(dt, T.VariantType):
        return True
    if isinstance(dt, T.StructType):
        return any(_has_variant(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _has_variant(dt.elementType)
    if isinstance(dt, T.MapType):
        return _has_variant(dt.keyType) or _has_variant(dt.valueType)
    return False


def required_protocol(meta, extra: Iterable[str] = ()) -> Protocol:
    """Minimum protocol the table state requires (spec version map)."""
    feats = active_features(meta, extra)
    r = max(FEATURE_VERSIONS[f][0] for f in feats)
    w = max(FEATURE_VERSIONS[f][1] for f in feats)
    rf = sorted(feats & READER_FEATURES) \
        if r >= TABLE_FEATURES_READER_VERSION else None
    wf = sorted(feats) if w >= TABLE_FEATURES_WRITER_VERSION else None
    return Protocol(r, w, readerFeatures=rf, writerFeatures=wf)


def _implied_features(p: Protocol) -> Set[str]:
    """Features a protocol demands: the explicit lists plus everything
    its legacy version components imply. A legacy (r, w) implies every
    feature whose spec versions are dominated by it; writer-7-only
    features (deletionVectors, inCommitTimestamp) are never implied —
    they exist only through the explicit lists."""
    feats = set(p.readerFeatures or []) | set(p.writerFeatures or [])
    if p.minWriterVersion < TABLE_FEATURES_WRITER_VERSION:
        # Version-implication applies only to LEGACY protocols; at
        # writer 7 the explicit lists are authoritative.
        for f, (r, w) in FEATURE_VERSIONS.items():
            if w < TABLE_FEATURES_WRITER_VERSION \
                    and r <= p.minReaderVersion and w <= p.minWriterVersion:
                feats.add(f)
    return feats


def merge_protocols(cur: Protocol, req: Protocol) -> Protocol:
    """Component-wise max + feature union (protocols are monotone)."""
    r = max(cur.minReaderVersion, req.minReaderVersion)
    w = max(cur.minWriterVersion, req.minWriterVersion)
    feats = _implied_features(cur) | _implied_features(req)
    rf = sorted(feats & READER_FEATURES) \
        if r >= TABLE_FEATURES_READER_VERSION else None
    wf = sorted(feats) if w >= TABLE_FEATURES_WRITER_VERSION else None
    return Protocol(r, w, readerFeatures=rf, writerFeatures=wf)


def protocol_dominates(a: Protocol, b: Protocol) -> bool:
    """True when ``a`` satisfies every demand ``b`` makes: both version
    components ≥ and ``b``'s (implied) feature set ⊆ ``a``'s. Protocols
    are monotone — a commit whose Protocol action does NOT dominate the
    snapshot's is a downgrade and must be refused (delta-spark raises
    ProtocolDowngradeException), else legacy readers would read physical
    column names or resurrect DV-deleted rows."""
    return (a.minReaderVersion >= b.minReaderVersion
            and a.minWriterVersion >= b.minWriterVersion
            and _implied_features(b) <= _implied_features(a))


def assert_readable(p: Protocol, table_path: str = "") -> None:
    """Refuse tables whose protocol demands reader capabilities this
    engine lacks (the same fail-loudly contract we want FOREIGN readers
    to honour for our upgraded tables)."""
    if p.minReaderVersion > MAX_SUPPORTED_READER_VERSION:
        raise ValueError(
            f"Unsupported reader protocol version {p.minReaderVersion} "
            f"(supported ≤ {MAX_SUPPORTED_READER_VERSION}) at "
            f"{table_path} (DeltaLogImpl.assertProtocolRead)")
    if p.minReaderVersion >= TABLE_FEATURES_READER_VERSION:
        missing = set(p.readerFeatures or []) - SUPPORTED_READER_FEATURES
        if missing:
            raise ValueError(
                f"Unsupported reader table features {sorted(missing)} "
                f"at {table_path}")


def assert_writable(p: Protocol, table_path: str = "") -> None:
    """Refuse commits to tables demanding writer capabilities this
    engine lacks."""
    if p.minWriterVersion > MAX_SUPPORTED_WRITER_VERSION:
        raise ValueError(
            f"Unsupported writer protocol version {p.minWriterVersion} "
            f"(supported ≤ {MAX_SUPPORTED_WRITER_VERSION}) at "
            f"{table_path}")
    if p.minWriterVersion >= TABLE_FEATURES_WRITER_VERSION:
        missing = set(p.writerFeatures or []) - SUPPORTED_WRITER_FEATURES
        if missing:
            raise ValueError(
                f"Unsupported writer table features {sorted(missing)} "
                f"at {table_path}")
