"""Schema registry + namespace catalog for keyed tables.

Rebuilds the reference's externally-declared schema system (SURVEY §1.3):
schemas live in a YAML document keyed by ``ns:table`` →
``{row: {key: type}, generator: {name: class}, cf: {qualifier: type}}``
(reference: ``src/main/resources/test.yml:1-60``, parsed by
``HBaseClientImpl.getSchemaProp`` / ``getSchema``,
``client/HBaseClientImpl.scala:113-152``).  A table's Spark schema is the
``row_key`` field followed by one flat ``cf:qualifier`` field per declared
qualifier — flat colon-containing names, exactly the reference's data model
(``SparkHBaseConstants.java:7-8``; backtick-quoting rule ``README.md:16-18``).

Unlike the reference — which re-reads the YAML file on *every* table lookup
(``HBaseClientImpl.scala:117-124``) — the registry parses once and serves
lookups from memory; ``reload()`` is the explicit invalidation point.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import types as T

ROW_KEY = "row_key"  # reference: SparkHBaseConstants.java:8
COLUMN_QUALIFIER_SPLITTER = ":"  # reference: SparkHBaseConstants.java:7

# Type-name → Spark type. Matches the reference's SQL type parser surface
# (HBaseSqlParser.scala:31-60) but with *full* fidelity for every Spark
# type (the reference's byte codecs silently degraded decimal/date/nested
# types to binary — SURVEY §1.4; Parquet storage has no such limitation).
_PRIMITIVES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "byte": T.ByteType(),
    "tinyint": T.ByteType(),
    "short": T.ShortType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "real": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "date": T.DateType(),
    "void": T.NullType(),
    # the reference's RegionInfo UDT is binary-with-helpers in our build
    # (types/RegionInfoUDT.scala:6-21 — UDT over BinaryType)
    "regioninfo": T.BinaryType(),
}


def parse_type(name: str) -> T.DataType:
    """Parse a registry type string into a Spark type.

    Handles the reference parser's surface (char/varchar/decimal with
    precision args, HBaseSqlParser.scala:31-60) plus array/map/struct via
    Spark's own DDL parser for anything non-primitive.
    """
    key = name.strip().lower()
    if key in _PRIMITIVES:
        return _PRIMITIVES[key]
    if key.startswith(("char", "varchar")):
        return T.StringType()
    # decimal(p,s), array<...>, map<...>, struct<...> — Spark DDL parser
    return T._parse_datatype_string(name)


@dataclass
class TableSpec:
    """Declared schema + storage properties for one keyed table."""

    namespace: str
    name: str
    key_type: str = "string"
    # ordered {"cf": {"qualifier": "type", ...}}
    families: dict[str, dict[str, str]] = field(default_factory=dict)
    # row-key generator class path / registered name (reference: per-table
    # "generator" YAML entry, test.yml:4-5, README.md:24-26)
    generator: str | None = None
    # range split points for the key — the analogue of HBase region split
    # keys ("split" table property, HBaseClientImpl.scala:262,273)
    split_keys: list = field(default_factory=list)
    properties: dict[str, str] = field(default_factory=dict)

    @property
    def qualified_name(self) -> str:
        return f"{self.namespace}.{self.name}"

    def column_names(self) -> list[str]:
        cols = [ROW_KEY]
        for cf, quals in self.families.items():
            cols += [f"{cf}{COLUMN_QUALIFIER_SPLITTER}{q}" for q in quals]
        return cols

    def schema(self) -> T.StructType:
        """row_key + one field per cf:qualifier (HBaseClientImpl.scala:140-152)."""
        fields = [T.StructField(ROW_KEY, parse_type(self.key_type), nullable=False)]
        for cf, quals in self.families.items():
            for qual, type_name in quals.items():
                fields.append(
                    T.StructField(
                        f"{cf}{COLUMN_QUALIFIER_SPLITTER}{qual}",
                        parse_type(type_name),
                        nullable=True,
                    )
                )
        return T.StructType(fields)

    @staticmethod
    def split_column(col: str) -> tuple[str | None, str]:
        """``"cf:qual"`` → ``(cf, qual)``; ``row_key`` → ``(None, row_key)``.

        Reference: ``utils/HBaseSparkFormatUtils.scala:8-15``.
        """
        if COLUMN_QUALIFIER_SPLITTER in col:
            cf, qual = col.split(COLUMN_QUALIFIER_SPLITTER, 1)
            return cf, qual
        return None, col


class SchemaRegistry:
    """In-memory registry of :class:`TableSpec`, loadable from YAML."""

    def __init__(self, specs: dict[str, TableSpec] | None = None, path: str | None = None):
        self._specs: dict[str, TableSpec] = dict(specs or {})
        self._path = path

    # -- loading ----------------------------------------------------------
    @classmethod
    def load(cls, path: str) -> "SchemaRegistry":
        import yaml

        with open(path) as fh:
            doc = yaml.safe_load(fh) or {}
        specs: dict[str, TableSpec] = {}
        for yaml_key, entry in doc.items():
            # YAML keys use the reference's `ns:table` form; the registry
            # keys by the engine's `ns.table` qualified name
            spec = cls._parse_entry(yaml_key, entry)
            specs[spec.qualified_name] = spec
        return cls(specs, path=path)

    @staticmethod
    def _parse_entry(qualified: str, entry: dict) -> TableSpec:
        ns, _, name = qualified.partition(COLUMN_QUALIFIER_SPLITTER)
        row = entry.get("row") or {}
        key_type = next(iter(row.values()), "string")
        generator = (entry.get("generator") or {}).get("name")
        families = {
            cf: dict(quals)
            for cf, quals in entry.items()
            if cf not in ("row", "generator", "split", "properties") and isinstance(quals, dict)
        }
        return TableSpec(
            namespace=ns or "default",
            name=name or qualified,
            key_type=key_type,
            families=families,
            generator=generator,
            split_keys=list(entry.get("split") or []),
            properties=dict(entry.get("properties") or {}),
        )

    def reload(self) -> None:
        if self._path:
            self._specs = SchemaRegistry.load(self._path)._specs

    # -- catalog surface (reference: HBaseExternalCatalog.scala:14-183) ---
    def register(self, spec: TableSpec) -> None:
        self._specs[spec.qualified_name] = spec

    def drop(self, qualified_name: str) -> None:
        self._specs.pop(qualified_name, None)

    def get(self, qualified_name: str) -> TableSpec:
        try:
            return self._specs[qualified_name]
        except KeyError:
            raise KeyError(f"Table not found in registry: {qualified_name}") from None

    def exists(self, qualified_name: str) -> bool:
        return qualified_name in self._specs

    def namespaces(self) -> list[str]:
        return sorted({s.namespace for s in self._specs.values()})

    def tables(self, namespace: str | None = None) -> list[str]:
        return sorted(
            s.qualified_name
            for s in self._specs.values()
            if namespace is None or s.namespace == namespace
        )


def default_registry_path() -> str | None:
    p = os.path.join(os.path.dirname(__file__), "..", "conf", "tables.yml")
    return os.path.abspath(p) if os.path.exists(p) else None
