"""RAM-resident merged minibatches, replayed per epoch.

Kaldi's production workflow materializes egs ONCE offline
(nnet3-chain-get-egs | shuffle | merge, SURVEY.md §2.2) and every epoch
re-reads the same merged archives — after merging, the minibatch
GROUPING is fixed; only the visit order varies.  The in-process
ChainDataset instead re-pads/stacks every epoch, which the r5 sustained
bench measured at 50-180 ms/batch of pure numpy against a 5-11 ms device
step.  `MaterializedBatches` restores the Kaldi economics in process:
one materialization pass through the source dataset, then per-epoch
replay with only the order reshuffled — per-batch cost collapses to
device placement.

Memory: batches are held as their host numpy pytrees (tens of MB per
production batch), so this suits bench/corpus-fits-in-RAM runs.  For
corpora beyond RAM, the disk-backed equivalent is the real cegs path:
`dataset_to_cegs` once, then train with `cli.train --cegs` (CegsDataset
re-parses archives per epoch, the literal Kaldi behavior).

Frame-shift augmentation note: materialization pins the source dataset's
current `frame_shift`; the per-epoch `frame_shift_cycle` trainer option
needs the live loader (Kaldi equivalent: nnet3-chain-copy-egs
--frame-shift re-reads the archive per epoch).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class PlacedBatch:
    """A minibatch already resident on device: `feats` is a jnp array,
    `sup` a DeviceSupervision.  Exposes the same attribute surface the
    trainer reads (`feats.shape`, `sup.num_frames`), and
    `Trainer._put_batch` passes it through without a fresh H2D."""

    feats: object
    sup: object


class MaterializedBatches:
    """Duck-types the dataset surface Trainer.fit consumes (`batches`,
    `estimate_sup_caps`) over a fixed list of pre-built ChainBatch
    objects."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        sup_caps: "tuple[int, ...] | None" = None,
        seed: int = 0,
        process_index: "int | None" = None,
        process_count: "int | None" = None,
        device: bool = False,
    ):
        """With device=True, every batch is placed on device ONCE at
        materialization (feats as jnp arrays, supervision as
        DeviceSupervision) and epochs replay the resident arrays with
        ZERO per-step host->device traffic — the TPU-native economics
        when the corpus fits HBM alongside the model.  Supervision
        tensors are constant across epochs by construction (Kaldi's
        merged archives are too), so nothing is lost.  Requires a
        single process (multi-host shards must stream)."""
        self.seed = seed
        self._caps = (
            sup_caps
            if sup_caps is not None
            else dataset.estimate_sup_caps()
            if hasattr(dataset, "estimate_sup_caps")
            else None
        )
        kw = {}
        if self._caps is not None:
            kw["sup_caps"] = self._caps
        if process_count is not None and process_count > 1:
            if device:
                raise ValueError(
                    "device=True materialization is single-process; "
                    "multi-host runs stream their shards"
                )
            kw["process_index"] = process_index
            kw["process_count"] = process_count
        self._batches = list(
            dataset.batches(batch_size, shuffle=True, epoch=0, **kw)
        )
        if not self._batches:
            raise ValueError("source dataset yielded no batches")
        if device:
            import jax.numpy as jnp

            from torchain_tpu.ops.device_graphs import DeviceSupervision

            placed = []
            for b in self._batches:
                placed.append(
                    PlacedBatch(
                        feats=jnp.asarray(b.feats),
                        # kernel-layout numerator tables prepared once at
                        # placement: the resident kernels' in-step
                        # transposes vanish for every epoch's replay
                        sup=DeviceSupervision.from_host(
                            b.sup
                        ).with_kernel_tables(),
                    )
                )
            import jax

            jax.block_until_ready([p.feats for p in placed])
            self._batches = placed

    def __len__(self) -> int:
        return len(self._batches)

    @property
    def nbytes(self) -> int:
        total = 0
        for b in self._batches:
            for obj in (b.feats, b.sup):
                if hasattr(obj, "nbytes"):
                    total += obj.nbytes
                else:
                    for f in dataclasses.fields(obj):
                        v = getattr(obj, f.name)
                        if hasattr(v, "nbytes"):
                            total += v.nbytes
        return total

    def estimate_sup_caps(self):
        if self._caps is None:
            raise ValueError("source dataset had no estimate_sup_caps")
        return self._caps

    def batches(
        self,
        batch_size: int,  # ignored: fixed at materialization
        shuffle: bool = True,
        drop_last: bool = True,
        epoch: "int | None" = None,
        process_index: "int | None" = None,
        process_count: "int | None" = None,
        sup_caps: "tuple[int, ...] | None" = None,
        num_threads: "int | None" = None,
    ):
        del batch_size, drop_last, sup_caps, num_threads
        if process_count is not None and process_count > 1:
            raise ValueError(
                "multi-host sharding must be applied at materialization "
                "time (pass process_index/process_count to the "
                "constructor)"
            )
        order = np.arange(len(self._batches))
        if shuffle:
            rng = np.random.default_rng(
                [self.seed & 0x7FFFFFFF, int(epoch or 0)]
            )
            rng.shuffle(order)
        for i in order:
            yield self._batches[int(i)]
