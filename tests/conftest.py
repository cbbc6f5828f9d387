from __future__ import annotations

import pytest

from ckg_spark.corpus.pages import PagesConfig, config_from_vocab
from ckg_spark.corpus.vocab import VocabConfig, generate_vocab
from ckg_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ckg-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def vocab():
    return generate_vocab(VocabConfig(seed=7, terms_per_type=30))


@pytest.fixture(scope="session")
def pages_cfg(vocab):
    return config_from_vocab(vocab, n_docs=200, seed=42, partitions=8)
