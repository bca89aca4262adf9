"""Declarative named-source registry — the conns.yaml analog.

The reference binds every pipeline to named endpoints declared in YAML
with ``<param>`` placeholders and ``$ENV`` references
(/root/reference/etl/conns.yaml:5-47, fetched at
/root/reference/etl/trade_comtrade_monthly_pipeline.py:89-90). This
module supplies the same declarative surface for the Spark engine:

    comtrade-monthly:
      driver: csv
      uri: /data/raw/comtrade/<year>-<month>/*.csv
      options: {header: "true", sep: ";"}

    changelog:
      driver: parquet
      uri: $DATA_ROOT/changes/<table>

``driver`` is a Spark read format (parquet/json/csv/text/binaryFile) —
this sandbox has no network, so URIs are file paths/globs; an HTTP
driver would stage to a path and resolve to it. A connector resolves to
a concrete path by binding run params into ``<param>`` slots (the
reference's param grid) and expanding ``$ENV`` vars; unbound params
fail loudly instead of producing a silent empty glob.

``EngineConfig.connectors_path`` switches ``changes_dir`` from a bare
path to a connector NAME looked up here (see streaming/engine.py).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import IO

import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_PARAM = re.compile(r"<(\w+)>")


@dataclass(frozen=True)
class Connector:
    name: str
    driver: str  # spark read format: parquet | json | csv | text | binaryFile
    uri: str  # path template with <param> placeholders and $ENV vars
    options: dict[str, str] = field(default_factory=dict)

    def resolve(self, params: dict | None = None) -> str:
        """Bind ``<param>`` placeholders and ``$ENV`` vars to a concrete
        path. Raises KeyError on any unbound placeholder."""
        uri = os.path.expandvars(self.uri)
        for k, v in (params or {}).items():
            uri = uri.replace(f"<{k}>", str(v))
        if m := _PARAM.search(uri):
            raise KeyError(
                f"unbound connector param <{m.group(1)}> in connector {self.name!r} ({self.uri})"
            )
        return uri

    def read(
        self,
        spark: SparkSession,
        params: dict | None = None,
        schema: T.StructType | None = None,
    ) -> DataFrame:
        """Batch-read the resolved source with the declared format and
        options (one distributed read, however many files the glob
        matches — the Spark replacement for the reference's
        download-then-foreach fan-out)."""
        reader = spark.read.format(self.driver).options(**self.options)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(self.resolve(params))

    def read_stream(
        self,
        spark: SparkSession,
        schema: T.StructType,
        params: dict | None = None,
    ) -> DataFrame:
        """Streaming read of the resolved source dir (file-source tail);
        streams require an explicit schema."""
        reader = spark.readStream.format(self.driver).options(**self.options).schema(schema)
        return reader.load(self.resolve(params))


def load_connectors(source: str | IO) -> dict[str, Connector]:
    """Parse a conns.yaml mapping {name: {driver, uri, options?}}."""
    if isinstance(source, str):
        with open(source) as f:
            data = yaml.safe_load(f)
    else:
        data = yaml.safe_load(source)
    out: dict[str, Connector] = {}
    for name, spec in (data or {}).items():
        out[name] = Connector(
            name=name,
            driver=spec["driver"],
            uri=spec["uri"],
            options={k: str(v) for k, v in (spec.get("options") or {}).items()},
        )
    return out


def fetch(name: str, source: str | IO) -> Connector:
    """Look up one named connector (the reference's
    ``Connector.fetch(name, open("etl/conns.yaml"))`` shape)."""
    conns = load_connectors(source)
    if name not in conns:
        raise KeyError(f"no connector {name!r}; defined: {sorted(conns)}")
    return conns[name]
