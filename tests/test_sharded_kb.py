"""Sharded KB-subgraph tier ≡ broadcast KB image (state/sharded_kb.py)."""

import os

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def kb_tier(ray_session, kb_objects):
    from table_annotation_ray.state.sharded_kb import ShardedKBTier

    kb, _, _ = kb_objects
    return ShardedKBTier.create(kb, num_shards=4, num_cpus_per_shard=0)


@pytest.fixture(scope="module")
def parquet_tier(ray_session, synth_root):
    from table_annotation_ray.state.sharded_kb import ShardedKBTier

    return ShardedKBTier.create_from_parquet(
        os.path.join(synth_root, "kb"), num_shards=3, num_cpus_per_shard=0
    )


def _sample_entities(kb, n=40):
    ents = sorted(kb.subgraphs)[:n]
    return ents + ["Q999999999", "Qnope"]  # misses get defaults


def test_reader_primitives_equal(kb_tier, kb_objects):
    kb, kbr, _ = kb_objects
    reader = kb_tier.make_reader()
    for eid in _sample_entities(kb):
        assert reader.get_subgraph_of_entity(eid) == kbr.get_subgraph_of_entity(eid), eid
        assert reader.get_label_of_entity(eid) == kbr.get_label_of_entity(eid), eid
        assert reader.get_num_edges(eid) == kbr.get_num_edges(eid), eid


def test_derived_getters_equal(kb_tier, kb_objects):
    kb, kbr, _ = kb_objects
    reader = kb_tier.make_reader()
    for eid in _sample_entities(kb, 25):
        assert reader.get_types_of_entity(eid, 3) == kbr.get_types_of_entity(eid, 3)
        assert reader.get_supertypes_of_type(eid) == kbr.get_supertypes_of_type(eid)
        assert reader.get_symbol_of_unit_entity(eid) == kbr.get_symbol_of_unit_entity(eid)


def test_prefetch_then_local_hits(kb_tier, kb_objects):
    kb, kbr, _ = kb_objects
    reader = kb_tier.make_reader()
    ents = sorted(kb.subgraphs)[:10]
    reader.prefetch(ents)
    # after prefetch, everything the type walk touches is cached
    for eid in ents:
        assert eid in reader._cache
        h = kbr.get_types_of_entity(eid, 3)
        for lvl in ("level_1", "level_2"):
            for t in h.get(lvl, {}):
                assert t in reader._cache, (eid, lvl, t)


def test_gazetteer_equal(kb_tier, kb_objects):
    _, kbr, _ = kb_objects
    assert kb_tier.make_reader().build_gazetteer() == kbr.build_gazetteer()


def test_parquet_shards_partition_kb(parquet_tier, kb_objects):
    import ray

    kb, _, _ = kb_objects
    sizes = ray.get([a.num_entities.remote() for a in parquet_tier.actors])
    assert sum(sizes) == len(kb.subgraphs)
    reader = parquet_tier.make_reader()
    for eid in _sample_entities(kb, 15):
        assert reader.get_subgraph_of_entity(eid) == kb.subgraphs.get(eid, {})


def test_triples_identical_with_tier(ray_session, synth_root, kb_objects):
    """The flagship output is byte-identical with the sharded KB+lookup
    tiers enabled (kb image never shipped to workers)."""
    import ray

    from table_annotation_ray.pipelines.kg_pipeline import (
        read_transcripts,
        triples_from_turns,
    )
    from table_annotation_ray.state.sharded_kb import ShardedKBTier
    from table_annotation_ray.state.sharded_lookup import ShardedLookupTier

    kb, _, _ = kb_objects
    path = os.path.join(synth_root, "transcripts.parquet")

    kb_ref = ray.put(kb)
    base = (
        triples_from_turns(read_transcripts(path), kb_ref)
        .to_pandas()
        .sort_values(["subj", "pred", "obj", "conv_id"])
        .reset_index(drop=True)
    )

    kb_tier = ShardedKBTier.create(kb, num_shards=4, num_cpus_per_shard=0)
    lookup_tier = ShardedLookupTier.create(kb, num_shards=4, num_cpus_per_shard=0)
    tiered = (
        triples_from_turns(
            read_transcripts(path), None, kb_tier=kb_tier, lookup_tier=lookup_tier
        )
        .to_pandas()
        .sort_values(["subj", "pred", "obj", "conv_id"])
        .reset_index(drop=True)
    )
    assert len(base) > 0
    pd.testing.assert_frame_equal(base, tiered)
