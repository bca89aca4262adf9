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

``driver`` is a Spark read format (parquet/json/csv/text/binaryFile),
or ``http`` — the download-then-read shape of the reference's
DownloadStep (`/root/reference/etl/trade_comtrade_monthly_pipeline.py:89-104`):
the URL (with bound params) is staged once into a local cache dir with
cache-if-exists semantics (re-runs and resumed backfills never
re-download) and Spark reads the staged file with the ``format``
option. Staging is atomic (``.part`` + rename) so a crash mid-download
never leaves a half file that a resume would trust. A connector
resolves to a concrete path by binding run params into ``<param>``
slots (the reference's param grid) and expanding ``$ENV`` vars;
unbound params fail loudly instead of producing a silent empty glob.

    comtrade-remote:
      driver: http
      uri: http://comtrade.example/api/get/<year>/<month>
      options: {format: csv, header: "true", stage_dir: /data/stage}

At cluster scale the staged path must be shared storage (HDFS/object
store via a staging job); here staging is a driver-side download —
the grid fan-out (many (year,month) params) parallelizes across
pipeline runs, matching the reference's per-param download loop.

``EngineConfig.connectors_path`` switches ``changes_dir`` from a bare
path to a connector NAME looked up here (see streaming/engine.py).
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import tempfile
import urllib.request
from dataclasses import dataclass, field
from typing import IO

import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_PARAM = re.compile(r"<(\w+)>")

# http-driver options consumed by staging, never forwarded to the
# Spark reader
_HTTP_OPTS = {"format", "stage_dir"}


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

    def stage(self, params: dict | None = None) -> str:
        """(http driver) Download the bound URL into the stage dir if —
        and only if — no staged copy exists, and return the local path.
        The cache key is the sha1 of the full URL, so two params that
        bind to different URLs never collide and re-running the same
        param grid is a no-op (the reference's local-cache semantics,
        S5). Atomic: bytes land in a ``.part`` temp file first and are
        renamed only on complete success."""
        if self.driver != "http":
            raise ValueError(f"stage() is the http driver's method; {self.name!r} is {self.driver!r}")
        url = self.resolve(params)
        stage_dir = self.options.get("stage_dir") or os.path.join(
            tempfile.gettempdir(), "oec_etl_http_stage"
        )
        base = os.path.basename(url.split("?", 1)[0]) or "download"
        # each URL stages into ITS OWN subdir so the parent of a staged
        # file is a directory holding exactly that download — which is
        # what a Spark file source (batch basePath or streaming tail)
        # wants to be pointed at
        url_dir = os.path.join(stage_dir, hashlib.sha1(url.encode()).hexdigest()[:16])
        dest = os.path.join(url_dir, base)
        if os.path.exists(dest):
            return dest
        os.makedirs(stage_dir, exist_ok=True)
        fd, part = tempfile.mkstemp(dir=stage_dir, suffix=".part")
        try:
            with os.fdopen(fd, "wb") as out, urllib.request.urlopen(url) as resp:
                shutil.copyfileobj(resp, out)
            # the per-URL dir appears only on complete success
            os.makedirs(url_dir, exist_ok=True)
            os.replace(part, dest)
        finally:
            if os.path.exists(part):
                os.unlink(part)
        return dest

    def read(
        self,
        spark: SparkSession,
        params: dict | None = None,
        schema: T.StructType | None = None,
    ) -> DataFrame:
        """Batch-read the resolved source with the declared format and
        options (one distributed read, however many files the glob
        matches — the Spark replacement for the reference's
        download-then-foreach fan-out). The http driver stages first
        (cache-if-exists) and reads the staged file with its ``format``
        option."""
        if self.driver == "http":
            fmt = self.options.get("format", "csv")
            opts = {k: v for k, v in self.options.items() if k not in _HTTP_OPTS}
            reader = spark.read.format(fmt).options(**opts)
            if schema is not None:
                reader = reader.schema(schema)
            return reader.load(self.stage(params))
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
        streams require an explicit schema. The http driver stages
        first (cache-if-exists) and tails the staged copy's per-URL
        directory — which holds exactly that one download (stage()
        keys each URL into its own sha1(url) subdir), so the stream
        observes one static file: the batch-download-as-bounded-stream
        shape. A re-stage under different params lands in a SIBLING
        dir this tail never sees; multi-segment live tailing is the
        engine's watched-dir pattern (EngineConfig.changes_dir as a
        path), not the http driver's."""
        if self.driver == "http":
            fmt = self.options.get("format", "csv")
            opts = {k: v for k, v in self.options.items() if k not in _HTTP_OPTS}
            return (
                spark.readStream.format(fmt).options(**opts).schema(schema)
                .load(os.path.dirname(self.stage(params)))
            )
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
