"""HTTP serving surface (jobs/serve_api.py): the reference's deployable
lookup/preprocess/annotate API (README examples + docker-compose),
served from in-process state — no Ray, stdlib HTTP.  The server is
started on an ephemeral port inside the test and driven end-to-end
with urllib; responses must carry the reference JSON shapes and agree
with the batch pipelines on the same inputs."""

import json
import os
import threading
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server(synth_root):
    from jobs.serve_api import serve

    srv, state = serve(os.path.join(synth_root, "kb"), port=0)  # ephemeral
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_health(server):
    base, state = server
    with urllib.request.urlopen(base + "/health") as r:
        body = json.loads(r.read())
    assert r.status == 200 and body["status"] == "ok"
    assert body["entities"] == len(state.kb.labels) > 0


def test_lookup_reference_shape_and_parity(server):
    base, state = server
    label = next(iter(state.kb.labels.values()))
    status, body = _post(base, "/lookup", {"labels": [label, "zzz-no-match"]})
    assert status == 200
    assert set(body) == {"executionTimeSec", "output"}
    by_label = {o["label"]: o["entities"] for o in body["output"]}
    assert len(by_label[label]) >= 1
    top = by_label[label][0]
    assert set(top) == {"entity", "label", "score"}
    # parity with the in-process index (the batch lookup stage's state)
    want = state.stage.index.search(label.lower())
    assert [e["entity"] for e in by_label[label]] == [eid for eid, _ in want]
    assert by_label["zzz-no-match"] == []


def test_preprocess_reference_shape(server):
    base, _ = server
    table = [["city", "country"], ["Paris", "France"], ["Berlin", "Germany"],
             ["Madrid", "Spain"], ["Rome", "Italy"]]
    status, body = _post(base, "/preprocess", {"table": table})
    assert status == 200
    assert body["raw"]["tableDataRaw"] == table
    pre = body["preprocessed"]
    assert pre["tableOrientation"]["orientationLabel"] == "HORIZONTAL"
    assert pre["headerInfo"]["hasHeader"] is True
    assert pre["primaryKeyInfo"]["primaryKeyPosition"] == 0


def test_annotate_agrees_with_batch_pipeline(server, ray_session):
    import ray
    import ray.data as rd

    from table_annotation_ray.pipelines.table_pipeline import annotate_tables

    base, state = server
    # build a small annotatable table from KB labels (subject + object)
    kbr = state.stage.kbr
    rows = [["name", "value"]]
    for qid, label in list(state.kb.labels.items())[:4]:
        rows.append([label, "1994"])
    status, body = _post(base, "/annotate", {"table": rows})
    assert status == 200
    assert set(body) == {"annotated", "raw", "requestInfo"}
    ann = body["annotated"]
    assert set(ann) >= {"CEA", "CTA", "CPA"}
    assert len(ann["CEA"]) >= 1
    # service result == batch pipeline result on the identical table
    ds = rd.from_items(
        [{"table_id": "t", "row_idx": i, "cells": r} for i, r in enumerate(rows)]
    )
    batch_out = annotate_tables(ds, ray.put(state.kb)).to_pandas()
    batch_ann = json.loads(batch_out["annotated"].iloc[0])
    assert ann == batch_ann


def test_error_paths(server):
    base, _ = server
    # malformed JSON -> 400, not a dead server
    req = urllib.request.Request(base + "/lookup", data=b"{not json")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/annotate", {"table": "not-a-table"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/nope", {})
    assert e.value.code == 404
    # server still alive afterwards
    with urllib.request.urlopen(base + "/health") as r:
        assert r.status == 200


def test_annotate_concurrent_correctness(server):
    """Concurrent /annotate requests (per-thread annotator, shared
    index/KB/caches) must each return exactly the single-flight result
    for their table — no cross-request state bleed, no errors."""
    import concurrent.futures

    base, state = server
    labels = list(state.kb.labels.values())
    tables = []
    for k in range(6):  # six DIFFERENT tables
        rows = [["name", "value"]]
        for label in labels[k : k + 4]:
            rows.append([label, str(1990 + k)])
        tables.append(rows)

    # single-flight ground truth per table
    want = []
    for t in tables:
        status, body = _post(base, "/annotate", {"table": t})
        assert status == 200
        want.append(body["annotated"])

    # hammer concurrently, interleaving the six tables
    def call(i):
        status, body = _post(base, "/annotate", {"table": tables[i % 6]})
        assert status == 200
        return i % 6, body["annotated"]

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(call, range(24)))
    for i, ann in results:
        assert ann == want[i], f"table {i} diverged under concurrency"
