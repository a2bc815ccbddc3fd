"""S13 — the datasource-config driver.

Reference: scripts/dataload_00_prepare.py:7-40 expands datasource YAML
configs + file globs into the ingest work list, and each config's
``command`` string encodes which ingest binary + transform flags to run
(configs/datasource_configs/*.yaml). Here the same YAML shape drives
which *reader function* runs with which ``JsonlTransform`` — the
driver-side plan assembly for ``pipeline.build_graph``.

Supported command forms (the reference's grebi_* CLI vocabulary):
  grebi_transform_jsonl  --json-rename-field a:b --json-inject-type T
                         --json-inject-key-prefix p:
                         --json-inject-value-prefix f:pfx --json-inject-hashid
  grebi_tsv2jsonl        --tsv-array-delimiter D
  grebi_ingest_kgx_edges / grebi_ingest_sssom / grebi_ingest_gwas …
"""

from __future__ import annotations

import glob as globlib
import shlex
from dataclasses import dataclass

import yaml
from pyspark.sql import DataFrame, SparkSession

from .jsonl import JsonlTransform, read_jsonl_nodes
from .sssom import sssom_to_nodes
from .tsv import read_tsv, tsv_to_nodes


@dataclass
class IngestJob:
    datasource: str
    files: list[str]
    command: str


def load_datasource_config(path: str) -> list[IngestJob]:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if not cfg.get("enabled", True):
        return []
    jobs = []
    for ingest in cfg.get("ingests", []):
        files: list[str] = []
        for g in ingest.get("globs", []):
            files.extend(sorted(globlib.glob(g)))
        jobs.append(
            IngestJob(
                datasource=cfg["name"],
                files=files,
                command=" ".join(ingest.get("command", "").split()),
            )
        )
    return jobs


def transform_from_command(command: str) -> JsonlTransform:
    """Parse grebi_transform_jsonl flags into a JsonlTransform."""
    toks = shlex.split(command)
    renames, vprefix, denest = [], [], []
    inject_type = key_prefix = None
    hashid = False
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "--json-rename-field":
            a, b = toks[i + 1].split(":", 1)
            renames.append((a, b))
            i += 2
        elif t == "--json-inject-type":
            inject_type = toks[i + 1]
            i += 2
        elif t == "--json-inject-key-prefix":
            key_prefix = toks[i + 1]
            i += 2
        elif t == "--json-inject-value-prefix":
            f, p = toks[i + 1].split(":", 1)
            vprefix.append((f, p))
            i += 2
        elif t == "--json-denest-field":
            denest.append(toks[i + 1])
            i += 2
        elif t == "--json-inject-hashid":
            hashid = True
            i += 1
        else:
            i += 1
    return JsonlTransform(
        rename_fields=tuple(renames),
        inject_type=inject_type,
        key_prefix=key_prefix,
        value_prefix=tuple(vprefix),
        denest=tuple(denest),
        inject_hash_id=hashid,
    )


def run_ingest_job(spark: SparkSession, job: IngestJob, subgraph: str = "default") -> DataFrame:
    """Dispatch one ingest job to the matching reader (the reference pipes
    zcat | <command> | normalise; Spark reads .gz natively)."""
    cmd = job.command
    out: DataFrame | None = None
    for path in job.files:
        if "grebi_transform_jsonl" in cmd or cmd == "":
            df = read_jsonl_nodes(
                spark, path, job.datasource, subgraph, transform_from_command(cmd)
            )
        elif "grebi_tsv2jsonl" in cmd:
            delim = None
            toks = shlex.split(cmd)
            if "--tsv-array-delimiter" in toks:
                delim = toks[toks.index("--tsv-array-delimiter") + 1]
            df = tsv_to_nodes(
                read_tsv(spark, path), job.datasource, subgraph, array_delimiter=delim
            )
        elif "grebi_ingest_sssom" in cmd:
            df = sssom_to_nodes(spark, path, job.datasource, subgraph)
        else:
            raise ValueError(f"unsupported ingest command for {job.datasource}: {cmd}")
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise ValueError(f"no input files matched for {job.datasource}")
    return out
