"""Multi-process data-parallel worker (CPU backend) — spawned by
tests/test_multihost.py (2 processes on localhost) and usable as a manual
smoke tool for the multi-host data path:

  python tools/multihost_worker.py <coord_port> <pid> <nproc>

Each process: jax.distributed.initialize over localhost, per-process
1-device CPU platform, plans the identical (seed, epoch)-deterministic
global batch sequence, materializes only its row shard
(ChainDataset.batches process_index/process_count), assembles global
arrays (parallel.global_batch_from_local) and evaluates chain_loss + its
y-gradient under jit on the global mesh.  Prints one JSON line with the
loss and gradient checksum; the test compares against a single-process
run of the same global batch."""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "loss"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    if mode == "trainer":
        return trainer_main(pid, nproc)
    if mode == "cegs":
        return cegs_main(pid, nproc)
    import jax.numpy as jnp
    import numpy as np

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.ops import DeviceSupervision, auto_den_graph, chain_loss
    from torchain_tpu.parallel import MeshConfig, global_batch_from_local, make_mesh

    assert jax.process_count() == nproc, jax.process_count()
    corpus = synthetic_dataset(num_utts=12, num_phones=5, feat_dim=8, seed=7)
    ds = ChainDataset(
        corpus.utts,
        corpus.tree,
        corpus.norm_fst,
        chunk_frames_out=16,
        left_context=4,
        right_context=4,
        sup_opts=SupervisionOptions(frame_subsampling_factor=3),
        seed=3,
    )
    caps = ds.estimate_sup_caps()
    den = auto_den_graph(corpus.den_graph)
    mesh = make_mesh(MeshConfig(data=jax.device_count(), model=1))

    B_global = 4
    batch = next(
        ds.batches(
            B_global,
            epoch=0,
            process_index=pid,
            process_count=nproc,
            sup_caps=caps,
        )
    )
    # deterministic y from features (no model, no RNG divergence)
    rng = np.random.default_rng(11)
    proj = rng.normal(size=(8, corpus.tree.num_pdfs)).astype(np.float32) * 0.3
    t_out = batch.sup.num_frames
    f_local = batch.feats[:, 4 : 4 + t_out * 3 : 3, :]  # center input frames
    y_local = np.tanh(f_local @ proj)

    sup_dev = DeviceSupervision.from_host(batch.sup)
    # every array field of the supervision pytree has a leading local-B
    # axis, so the whole dataclass assembles into global arrays directly
    g = global_batch_from_local(
        mesh, dict(y=y_local.astype(np.float32), sup=sup_dev)
    )
    sup_global = g["sup"]

    @jax.jit
    def loss_and_grad(y, sup):
        def f(y):
            loss, aux = chain_loss(y, None, den, sup)
            return loss, aux
        (loss, aux), gy = jax.value_and_grad(f, has_aux=True)(y)
        return loss, aux["objf"], jnp.sum(jnp.abs(gy)), jnp.sum(gy * gy)

    loss, objf, g1, g2 = loss_and_grad(g["y"], sup_global)

    def host_float(x):
        # replicated outputs span non-addressable devices on a multihost
        # mesh; read the locally-addressable replica
        return float(np.asarray(x.addressable_data(0)))

    out = dict(
        pid=pid,
        nproc=nproc,
        devices=jax.device_count(),
        loss=host_float(loss),
        objf=host_float(objf),
        grad_l1=host_float(g1),
        grad_sq=host_float(g2),
    )
    print("MULTIHOST_RESULT " + json.dumps(out), flush=True)


def trainer_main(pid: int, nproc: int):
    """Drive the full multi-host Trainer.fit path (global batch assembly in
    Trainer._put_batch, psum'd grads, metrics via addressable replicas)."""
    import jax
    import numpy as np

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph
    from torchain_tpu.parallel import MeshConfig
    from torchain_tpu.train import Trainer, TrainerConfig

    corpus = synthetic_dataset(num_utts=12, num_phones=5, feat_dim=8, seed=7)
    cfg = TdnnfConfig(
        num_pdfs=corpus.tree.num_pdfs,
        hidden_dim=32,
        bottleneck_dim=8,
        prefinal_dim=16,
        num_layers=2,
    )
    model = TDNNF(cfg)
    left, right = cfg.context
    ds = ChainDataset(
        corpus.utts,
        corpus.tree,
        corpus.norm_fst,
        chunk_frames_out=16,
        left_context=left,
        right_context=right,
        sup_opts=SupervisionOptions(frame_subsampling_factor=3),
        seed=3,
    )
    den = auto_den_graph(corpus.den_graph)
    t_in = 16 * 3 + left + right
    tcfg = TrainerConfig(
        lr=1e-3,
        num_epochs=1,
        batch_size=4,  # GLOBAL batch
        log_every=1000,
        semi_ortho_every=0,
        loss=ChainLossOptions(leaky_hmm_coefficient=0.1),
        mesh=MeshConfig(data=jax.device_count(), model=1),
    )
    trainer = Trainer(model, den, tcfg, np.zeros((2, t_in, 8), np.float32))
    results = trainer.fit(ds, log_fn=lambda s: None)
    out = dict(
        pid=pid,
        nproc=nproc,
        devices=jax.device_count(),
        objf=results.objf,
        steps=results.steps,
        failed=results.tot_failed,
        weight=results.tot_weight,
    )
    print("MULTIHOST_RESULT " + json.dumps(out), flush=True)


def cegs_main(pid: int, nproc: int):
    """Multi-host training DIRECTLY from a merged cegs archive
    (CegsDataset's cross-process record partition — the foreign-egs
    torchain workflow under data parallelism).  Every process builds the
    IDENTICAL archive deterministically (same synthetic corpus + seed),
    then Trainer.fit consumes it with per-process record sharding; the
    test asserts both processes agree and match a single-process run."""
    import os
    import tempfile

    import jax
    import numpy as np

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.data.cegs import CegsDataset, dataset_to_cegs
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph
    from torchain_tpu.parallel import MeshConfig
    from torchain_tpu.train import Trainer, TrainerConfig

    # UNIFORM 48-frame utterances -> every chunk is exactly 16 output
    # frames -> shape-uniform merged records, the documented multi-host
    # requirement (CegsDataset docstring: nnet3-chain-merge-egs's
    # equal-length grouping provides this for real archives)
    corpus = synthetic_dataset(
        num_utts=12, num_phones=5, feat_dim=8, seed=7,
        utt_frames_out=(48, 49),
    )
    cfg = TdnnfConfig(
        num_pdfs=corpus.tree.num_pdfs,
        hidden_dim=32,
        bottleneck_dim=8,
        prefinal_dim=16,
        num_layers=2,
    )
    model = TDNNF(cfg)
    left, right = cfg.context
    ds = ChainDataset(
        corpus.utts,
        corpus.tree,
        corpus.norm_fst,
        chunk_frames_out=16,
        left_context=left,
        right_context=right,
        sup_opts=SupervisionOptions(frame_subsampling_factor=3),
        seed=3,
    )
    path = os.path.join(
        tempfile.gettempdir(), f"mh_cegs_{os.environ.get('MH_TAG', 'x')}_{pid}.ark"
    )
    # merged records of 2 sequences each: 4 records over 2 processes
    n_rec = dataset_to_cegs(ds, path, batch_size=2, shuffle_seed=5)
    den = auto_den_graph(corpus.den_graph)
    cegs = CegsDataset(path, append_ivector=False, seed=11)
    t_in = 16 * 3 + left + right
    tcfg = TrainerConfig(
        lr=1e-3,
        num_epochs=2,
        batch_size=0,  # merged records fix the batch size
        log_every=1000,
        semi_ortho_every=0,
        loss=ChainLossOptions(leaky_hmm_coefficient=0.1),
        mesh=MeshConfig(data=jax.device_count(), model=1),
    )
    if os.environ.get("MH_DEBUG_STEPS"):
        tcfg.log_every = 1
    trainer = Trainer(model, den, tcfg, np.zeros((2, t_in, 8), np.float32))
    results = trainer.fit(cegs, log_fn=lambda s: None)
    if os.environ.get("MH_DEBUG_STEPS"):
        for m in trainer.metrics_log:
            print(
                f"STEP pid={pid} step={m.get('step')} "
                f"objf={m.get('objf'):.6f} weight={m.get('weight')}",
                flush=True,
            )
    out = dict(
        pid=pid,
        nproc=nproc,
        devices=jax.device_count(),
        records=n_rec,
        objf=results.objf,
        steps=results.steps,
        weight=results.tot_weight,
    )
    print("MULTIHOST_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
