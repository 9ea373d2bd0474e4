"""Source configuration, readers, qualification, and content indexing.

Capabilities re-expressed from the reference (semantics at
/root/reference/src/matchbox/client/locations.py:223-393 and
client/sources.py:284-343) on Spark primitives:

- **S1 scan + ET**: a registered reader loads the location
  (parquet/csv/json/jdbc/table); an optional ``extract_transform`` SQL runs
  over it as a temp view — Catalyst fuses it with downstream plans, so
  predicate pushdown and column pruning reach the file scan.
- **S2 key-filter pushdown**: `.filter(col.isin(keys))` — Catalyst pushes the
  IN-list into the parquet/JDBC scan.
- **S3 ET validation**: single SELECT/CTE statement, no DDL/DML (sqlglot when
  installed, conservative regex fallback otherwise).
- **S4 type inference**: Spark infers schema on read; ``probe_schema`` reads a
  ``limit(1)``.
- **P1 field qualification**: every column prefixed ``{name}_``, key renamed
  ``key``, constant ``source`` column appended.
- **A1 content index**: H1 row hash over the index fields, rows with identical
  content collapse to one cluster carrying all their keys (map-side partial
  aggregation — one shuffle on the 32-byte hash).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matchbox_spark.functions.hashing import row_hash_expr

try:  # optional; not in the base environment
    import sqlglot
    from sqlglot import expressions as sge

    HAS_SQLGLOT = True
except ImportError:  # pragma: no cover
    HAS_SQLGLOT = False


class ExtractTransformError(ValueError):
    """Raised when an extract_transform SQL statement is not allowed."""


_FORBIDDEN_ET = re.compile(
    r"(?is)\b(insert|update|delete|merge|drop|create|alter|truncate|grant|revoke|"
    r"attach|copy|vacuum|call|set|pragma)\b"
)


def validate_extract_transform(sql: str) -> None:
    """Require a single read-only SELECT (or CTE) statement.

    Mirrors the reference's sqlglot-based gate (locations.py:223-294): single
    statement, query-only, no DDL/DML. Falls back to a conservative regex scan
    when sqlglot is unavailable.
    """
    # strip only a TRUE trailing semicolon (rstrip(";") would corrupt a
    # statement ending in a literal like SELECT ';')
    stripped = re.sub(r"[;\s]+$", "", sql.strip())
    if HAS_SQLGLOT:
        # single-statement detection by parsed-expression count — a ';'
        # inside a string literal (split(value, ';')) is legitimate
        try:
            parsed = sqlglot.parse(stripped)
        except Exception as e:  # noqa: BLE001
            raise ExtractTransformError(f"could not parse SQL: {e}") from e
        if len(parsed) != 1 or not isinstance(parsed[0], sge.Query):
            raise ExtractTransformError(
                "extract_transform must be a single SELECT/UNION statement"
            )
    else:
        # conservative fallback: scan for ';' with string literals removed
        # ('' and "" doubled-quote escapes included), so only a real
        # statement separator trips the gate
        literal_free = re.sub(r"'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"", "", stripped)
        if ";" in literal_free:
            raise ExtractTransformError(
                "extract_transform must be a single statement"
            )
        if not re.match(r"(?is)^\s*(select|with)\b", stripped):
            raise ExtractTransformError("extract_transform must start with SELECT/WITH")
        if _FORBIDDEN_ET.search(stripped):
            raise ExtractTransformError("extract_transform contains forbidden keywords")


LocationReader = Callable[[SparkSession, str, dict], DataFrame]

LOCATION_READERS: dict[str, LocationReader] = {}


def register_location_reader(fmt: str) -> Callable[[LocationReader], LocationReader]:
    """Extension surface for custom locations (reference Location subclasses)."""

    def deco(fn: LocationReader) -> LocationReader:
        LOCATION_READERS[fmt] = fn
        return fn

    return deco


@register_location_reader("parquet")
def _read_parquet(spark: SparkSession, location: str, options: dict) -> DataFrame:
    return spark.read.options(**options).parquet(location)


@register_location_reader("orc")
def _read_orc(spark: SparkSession, location: str, options: dict) -> DataFrame:
    return spark.read.options(**options).orc(location)


@register_location_reader("csv")
def _read_csv(spark: SparkSession, location: str, options: dict) -> DataFrame:
    opts = {"header": "true", "inferSchema": "true", **options}
    return spark.read.options(**opts).csv(location)


@register_location_reader("json")
def _read_json(spark: SparkSession, location: str, options: dict) -> DataFrame:
    return spark.read.options(**options).json(location)


@register_location_reader("jdbc")
def _read_jdbc(spark: SparkSession, location: str, options: dict) -> DataFrame:
    # location is the JDBC URL; options carries dbtable/query + credentials.
    # fetchsize plays the role of the reference's 10k-row batching.
    opts = {"url": location, "fetchsize": "10000", **options}
    return spark.read.format("jdbc").options(**opts).load()


@register_location_reader("table")
def _read_table(spark: SparkSession, location: str, options: dict) -> DataFrame:
    return spark.read.options(**options).table(location)


@register_location_reader("text")
def _read_text(spark: SparkSession, location: str, options: dict) -> DataFrame:
    """Line-oriented corpus ingestion: one string column ``value`` per line
    (``wholetext=true`` in options flips to one row per FILE). The raw-text
    on-ramp for the dedup/quality/tokenise family — pair with an ET like
    ``SELECT monotonically_increasing_id() AS doc_id, value AS text …`` to
    conform to the documents shape."""
    opts = dict(options)
    # Spark 4's python .text() honours wholetext only as a kwarg
    wholetext = str(opts.pop("wholetext", "false")).lower() == "true"
    return spark.read.options(**opts).text(location, wholetext=wholetext)


@register_location_reader("binaryfile")
def _read_binaryfile(
    spark: SparkSession, location: str, options: dict
) -> DataFrame:
    """Object-store ingestion of opaque media: Spark's built-in
    ``binaryFile`` source yields (path, modificationTime, length, content)
    per object — the scan that feeds the multimodal codec stages
    (operators/multimodal.py) without any decode on the scan path.
    ``pathGlobFilter`` in options prunes by extension server-side (e.g.
    ``"*.png"``); partition discovery and predicate pushdown on path/length
    come free from the DataSource V2 file framework. At 100 TB this is the
    layout story: objects stay in place, only matched paths are listed, and
    content bytes stream straight into Arrow batches."""
    return spark.read.format("binaryFile").options(**options).load(location)


def _infer_scalar_type(value):
    """Type of a probed non-null value (S4): Python natives map directly;
    strings are parsed as int → float → bool → ISO timestamp/date, falling
    back to string — the same ladder a schema-less CSV cell goes through."""
    import datetime as _dt

    from pyspark.sql import types as T

    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, (bytes, bytearray)):
        return T.BinaryType()
    if isinstance(value, _dt.datetime):
        return T.TimestampType()
    if isinstance(value, _dt.date):
        return T.DateType()
    if isinstance(value, str):
        s = value.strip()
        try:
            int(s)
            return T.LongType()
        except ValueError:
            pass
        try:
            float(s)
            return T.DoubleType()
        except ValueError:
            pass
        if s.lower() in ("true", "false"):
            return T.BooleanType()
        for fmt, t in (
            ("%Y-%m-%dT%H:%M:%S", T.TimestampType()),
            ("%Y-%m-%d %H:%M:%S", T.TimestampType()),
            ("%Y-%m-%d", T.DateType()),
        ):
            try:
                _dt.datetime.strptime(s[:19], fmt)
                return t
            except ValueError:
                continue
    return T.StringType()


@dataclass
class SourceConfig:
    """A source step: location + optional ET SQL + key field + index fields.

    The key field must be a string (reference dtos.py:315-324 invariant);
    ``read`` casts it.
    """

    name: str
    location: str
    key_field: str
    index_fields: list[str]
    format: str = "parquet"
    extract_transform: str | None = None
    options: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", self.name):
            raise ValueError(f"invalid source name: {self.name!r}")
        if self.extract_transform is not None:
            validate_extract_transform(self.extract_transform)

    # -- reading ------------------------------------------------------------

    def read(self, spark: SparkSession, keys: list[str] | None = None) -> DataFrame:
        """S1/S2: load the location, apply ET SQL, optionally filter to keys."""
        reader = LOCATION_READERS.get(self.format)
        if reader is None:
            raise ValueError(
                f"unknown location format {self.format!r}; "
                f"known: {sorted(LOCATION_READERS)}"
            )
        df = reader(spark, self.location, dict(self.options))
        if self.extract_transform:
            view = f"__src_{self.name}"
            df.createOrReplaceTempView(view)
            df = spark.sql(self.extract_transform.replace("$THIS", view))
        df = df.withColumn(self.key_field, F.col(self.key_field).cast("string"))
        if keys is not None:
            # IN-list filter; Catalyst pushes this into the scan (S2)
            df = df.filter(F.col(self.key_field).isin(keys))
        return df

    def probe_schema(self, spark: SparkSession, deep: bool = False):
        """S4: dtype probe (reference locations.py:296-320 semantics).

        Typed formats carry their schema — returned as-is. With ``deep=True``
        each untyped column (NullType, or StringType on inference-less
        formats) is probed with its own ``WHERE col IS NOT NULL LIMIT 1``
        scan — the reference's per-column probe — so a null-leading column
        still gets the type of its first real value instead of null/string.
        Each probe is a pushed-down scan that stops at the first qualifying
        row; only untyped columns pay it.
        """
        from pyspark.sql import types as T

        df = self.read(spark)
        if not deep:
            return df.schema
        # the string→int/float/date parsing ladder applies only to formats
        # whose strings are untyped cells (csv/text); parquet/orc/jdbc/table
        # string columns are authoritative — re-typing a postcode "12345"
        # as Long would record false drift in the stored config
        untyped_strings = self.format in ("csv", "text")
        fields = []
        for f0 in df.schema.fields:
            dtype = f0.dataType
            if isinstance(dtype, T.NullType) or (
                untyped_strings and isinstance(dtype, T.StringType)
            ):
                row = (
                    df.where(F.col(f0.name).isNotNull())
                    .select(f0.name)
                    .limit(1)
                    .collect()
                )
                if row and row[0][0] is not None:
                    dtype = _infer_scalar_type(row[0][0])
            if isinstance(dtype, T.NullType):
                dtype = T.StringType()  # all-null column: degrade to string
            fields.append(T.StructField(f0.name, dtype, True))
        return T.StructType(fields)

    def sample(self, spark: SparkSession, n: int = 10) -> DataFrame:
        """O3: first n rows."""
        return self.read(spark).limit(n)

    # -- serialisation -------------------------------------------------------

    def field_types(self, spark: SparkSession, deep: bool = False) -> dict[str, str]:
        """Index-field types in the reference's DataTypes wire format
        (common/datatypes.py): column → "Int64" / '{"type": "List", ...}'.
        What a stored source config records so a later session can validate
        the warehouse hasn't drifted."""
        from matchbox_spark.functions.datatypes import DataTypes

        schema = self.probe_schema(spark, deep=deep)
        by_name = {f.name: f.dataType for f in schema.fields}
        missing = [c for c in self.index_fields if c not in by_name]
        if missing:
            # a silently-omitted field would make the strongest drift
            # signal — a dropped/renamed warehouse column — undetectable
            raise ValueError(
                f"index fields absent from {self.location!r}: {missing}"
            )
        return {
            c: DataTypes.from_spark(by_name[c]).value
            for c in self.index_fields
        }

    def to_dict(self, spark: SparkSession | None = None) -> dict:
        """JSON-safe config dict; includes typed index fields when a session
        is given to probe them."""
        out = {
            "name": self.name,
            "location": self.location,
            "key_field": self.key_field,
            "index_fields": list(self.index_fields),
            "format": self.format,
            "extract_transform": self.extract_transform,
            "options": dict(self.options),
        }
        if spark is not None:
            out["field_types"] = self.field_types(spark)
        return out

    @classmethod
    def from_dict(cls, data: dict) -> "SourceConfig":
        data = dict(data)
        data.pop("field_types", None)  # informative, not constructive
        return cls(**data)

    # -- qualification ------------------------------------------------------

    @property
    def qualified_key(self) -> str:
        return f"{self.name}_{self.key_field}"

    def f(self, fields: str | list[str]) -> str | list[str]:
        """Qualified name(s) for fields of this source (reference dtos.f)."""
        if isinstance(fields, str):
            return f"{self.name}_{fields}"
        return [f"{self.name}_{x}" for x in fields]

    def qualify(self, df: DataFrame) -> DataFrame:
        """P1: prefix columns with ``{name}_``, rename key → ``key``, tag source."""
        cols = [
            F.col(c).alias("key" if c == self.key_field else f"{self.name}_{c}")
            for c in df.columns
        ]
        return df.select(*cols).withColumn("source", F.lit(self.name))

    # -- indexing ------------------------------------------------------------

    def index(self, spark: SparkSession, df: DataFrame | None = None) -> DataFrame:
        """A1/H1: content index ``(hash: binary, keys: array<string>)``.

        Rows whose *sorted* index fields are byte-identical share a hash and
        collapse to one cluster carrying every matching key. Single shuffle on
        the hash; ``collect_list`` runs with map-side partial aggregation.
        Keys are sorted for determinism.
        """
        if df is None:
            df = self.read(spark)
        fields = sorted(self.index_fields)
        missing = [c for c in fields + [self.key_field] if c not in df.columns]
        if missing:
            raise ValueError(f"source {self.name}: missing columns {missing}")
        hashed = df.select(
            row_hash_expr(df.schema, fields).alias("hash"),
            F.col(self.key_field).cast("string").alias("key"),
        )
        return hashed.groupBy("hash").agg(
            F.sort_array(F.collect_list("key")).alias("keys")
        )

    def cache_to_parquet(self, spark: SparkSession, path: str) -> None:
        """S5: materialise the source read as a snappy parquet cache."""
        self.read(spark).write.mode("overwrite").parquet(path)
