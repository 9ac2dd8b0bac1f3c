import logging
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (per project convention)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def synth_root(tmp_path_factory):
    """Small deterministic synthetic dataset + mini-KB (cached per run)."""
    from table_annotation_ray import synth

    root = tmp_path_factory.mktemp("synth")
    return synth.materialize(str(root), n_convs=60, seed=42)


@pytest.fixture(scope="session")
def kb_objects(synth_root):
    from table_annotation_ray.state.kb import KBReader, load_kb
    from table_annotation_ray.state.lookup_index import LabelIndex

    kb = load_kb(os.path.join(synth_root, "kb"))
    return kb, KBReader(kb), LabelIndex(kb)
