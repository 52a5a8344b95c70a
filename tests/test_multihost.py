"""Multi-host data pipeline: per-process sharded loading + global array
assembly (SURVEY.md section 2.3 rebuild plan; the capability Kaldi-era
torchain never had).

The real 2-process test spawns two fresh Python processes coordinated via
jax.distributed over localhost (CPU backend, 1 device each) and checks
the distributed loss/grad equals a single-process run of the same global
batch.  The in-process tests cover the deterministic shard-planning logic
itself."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from torchain_tpu.data import ChainDataset, synthetic_dataset
from torchain_tpu.graphs import SupervisionOptions

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dataset(seed=3):
    corpus = synthetic_dataset(num_utts=12, num_phones=5, feat_dim=8, seed=7)
    ds = ChainDataset(
        corpus.utts,
        corpus.tree,
        corpus.norm_fst,
        chunk_frames_out=16,
        left_context=4,
        right_context=4,
        sup_opts=SupervisionOptions(frame_subsampling_factor=3),
        seed=seed,
    )
    return corpus, ds


def test_sharded_batches_partition_the_global_batch():
    _, ds = _dataset()
    caps = ds.estimate_sup_caps()
    whole = list(ds.batches(4, epoch=0, sup_caps=(caps)))
    shards = [
        list(
            ds.batches(
                4, epoch=0, process_index=pi, process_count=2, sup_caps=caps
            )
        )
        for pi in range(2)
    ]
    assert len(whole) == len(shards[0]) == len(shards[1]) > 0
    for wb, s0, s1 in zip(whole, shards[0], shards[1]):
        np.testing.assert_array_equal(
            wb.feats, np.concatenate([s0.feats, s1.feats], axis=0)
        )
        np.testing.assert_array_equal(
            wb.sup.in_logw,
            np.concatenate([s0.sup.in_logw, s1.sup.in_logw], axis=0),
        )
        assert s0.sup.max_states == s1.sup.max_states == wb.sup.max_states
        assert s0.sup.max_arcs == s1.sup.max_arcs == wb.sup.max_arcs


def test_sharded_batches_validation():
    _, ds = _dataset()
    caps = ds.estimate_sup_caps()
    with pytest.raises(ValueError):
        next(ds.batches(5, epoch=0, process_index=0, process_count=2, sup_caps=caps))
    with pytest.raises(ValueError):
        next(ds.batches(4, epoch=0, process_index=0, process_count=2))


def test_two_process_loss_matches_single_process():
    # free port for the jax.distributed coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "multihost_worker.py"),
             str(port), str(pid), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MULTIHOST_RESULT ")]
        assert line, out[-3000:]
        results.append(json.loads(line[0].split(" ", 1)[1]))
    assert all(r["devices"] == 2 for r in results)
    # both processes computed the same global loss
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=1e-6)

    # single-process reference on the same global batch
    env1 = dict(env)
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port1 = s.getsockname()[1]
    s.close()
    ref = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_worker.py"),
         str(port1), "0", "1"],
        capture_output=True,
        text=True,
        env=env1,
        cwd=REPO,
        timeout=300,
    )
    assert ref.returncode == 0, ref.stdout[-3000:] + ref.stderr[-2000:]
    line = [l for l in ref.stdout.splitlines() if l.startswith("MULTIHOST_RESULT ")]
    r = json.loads(line[0].split(" ", 1)[1])
    assert r["loss"] == pytest.approx(results[0]["loss"], abs=5e-6)
    assert r["grad_l1"] == pytest.approx(results[0]["grad_l1"], rel=1e-5)


def _spawn(n, mode, env):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "multihost_worker.py"),
             str(port), str(pid), str(n), mode],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for pid in range(n)
    ]
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("MULTIHOST_RESULT ")]
        assert line, out[-3000:]
        results.append(json.loads(line[0].split(" ", 1)[1]))
    return results


def test_two_process_trainer_fit_matches_single_process():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    two = _spawn(2, "trainer", env)
    assert two[0]["objf"] == pytest.approx(two[1]["objf"], abs=1e-6)
    assert two[0]["failed"] == 0
    one = _spawn(1, "trainer", env)[0]
    # same (seed, epoch) global plan -> same batches -> same training curve
    assert one["steps"] == two[0]["steps"] > 0
    assert one["weight"] == pytest.approx(two[0]["weight"])
    assert one["objf"] == pytest.approx(two[0]["objf"], abs=5e-5)


def test_two_process_cegs_training_matches_single_process():
    """--cegs multi-host sharding (VERDICT r4 weak #6): two real
    processes train from the SAME merged cegs archive with disjoint
    record shards; per-epoch record counts are equal (the truncation
    fix) and the training curve matches a single-process run."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["MH_TAG"] = str(os.getpid())
    two = _spawn(2, "cegs", env)
    assert two[0]["records"] == two[1]["records"] > 1
    assert two[0]["steps"] == two[1]["steps"] > 0
    # both processes drive the SAME global computation: identical curve
    assert two[0]["objf"] == pytest.approx(two[1]["objf"], abs=1e-6)
    assert two[0]["weight"] == pytest.approx(two[1]["weight"])
    one = _spawn(1, "cegs", env)[0]
    # two-process steps combine two records per global batch, so the step
    # count halves while the data coverage (total weight) is identical
    assert one["steps"] == 2 * two[0]["steps"]
    assert one["weight"] == pytest.approx(two[0]["weight"])
