"""Shared fixtures: one session-scoped SparkSession + the tiny corpus,
its oracle result, and one shared end-to-end pipeline run."""

from __future__ import annotations

import pytest

from codedup.config import DedupConfig
from codedup.fixtures import generate_corpus, write_corpus
from codedup.oracle import run_oracle
from codedup.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("local[4]", app_name="codedup-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg():
    return DedupConfig()


@pytest.fixture(scope="session")
def tiny(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_corpus")
    paths = write_corpus(str(d), "tiny")
    tables = generate_corpus("tiny")
    return {"paths": paths, "tables": tables}


@pytest.fixture(scope="session")
def oracle_tiny(tiny, cfg):
    return run_oracle(tiny["tables"]["files"], cfg)


@pytest.fixture(scope="session")
def run_tiny(spark, tiny, cfg, tmp_path_factory):
    from codedup import pipeline

    work = tmp_path_factory.mktemp("work")
    return pipeline.run(
        spark, [tiny["paths"]["files"]], cfg, work_dir=str(work), run_id="t", resume=False
    )


def co_membership(comps) -> set[tuple[str, str]]:
    out: set[tuple[str, str]] = set()
    for comp in comps:
        ks = sorted(comp)
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                out.add((ks[i], ks[j]))
    return out


def spark_components(members_df) -> set[frozenset[str]]:
    pdf = members_df.select("key", "cluster_id").toPandas()
    return set(frozenset(g["key"]) for _, g in pdf.groupby("cluster_id"))
