from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ner_spark import synth
from ner_spark.session import get_spark

N_DOCS = 120


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ner_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def docs(spark):
    return synth.synth_docs(spark, N_DOCS, seed=42).cache()


@pytest.fixture(scope="session")
def gazetteer(spark):
    return synth.synth_gazetteer(spark).cache()


@pytest.fixture(scope="session")
def patterns(spark):
    return synth.synth_patterns(spark).cache()


@pytest.fixture(scope="session")
def combos():
    return [c["slots"] for c in synth.TRUSTED_COMBOS]


@pytest.fixture(scope="session")
def corrections(spark):
    return synth.synth_corrections(spark, N_DOCS, seed=42).cache()


@pytest.fixture(scope="session")
def gaz_rows(gazetteer):
    return [
        (r["alias"], r["label"])
        for r in gazetteer.select("alias", "label", "weight")
        .orderBy(F.desc("weight"), "alias", "label")
        .collect()
    ]


@pytest.fixture(scope="session")
def pattern_rows(patterns):
    return [
        (r["pattern_id"], r["regex"], r["label"])
        for r in patterns.select("pattern_id", "regex", "label")
        .orderBy("pattern_id")
        .collect()
    ]
