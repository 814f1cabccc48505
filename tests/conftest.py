import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libpostal_spark.config import PipelineConfig  # noqa: E402
from libpostal_spark.corpus import generate_corpus  # noqa: E402
from libpostal_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="libpostal_spark_tests", master="local[8]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg():
    return PipelineConfig()


@pytest.fixture(scope="session")
def corpus_pdf():
    """Small deterministic corpus shared across spark tests (t1 scale)."""
    return generate_corpus(
        n_base=120, dup_fraction=0.6, n_boilerplate_copies=25, n_clone_embed=5, seed=42
    )
