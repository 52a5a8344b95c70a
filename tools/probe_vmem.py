"""Probe usable VMEM on the attached TPU by compiling tiny Pallas kernels
that pin an N-MiB scratch buffer in VMEM.  Prints PASS/FAIL per size.

Usage: timeout 590 python tools/probe_vmem.py [sizes_mib...]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_size(mib: int) -> bool:
    rows = mib * 1024 * 1024 // (128 * 4)

    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :] * 2.0
        scratch[rows - 1, :] = x_ref[0, :] * 3.0
        o_ref[0, :] = scratch[0, :] + scratch[rows - 1, :]

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(mib + 2) * 1024 * 1024
        ),
    )
    x = jnp.ones((1, 128), jnp.float32)
    try:
        out = jax.jit(fn)(x)
        jax.block_until_ready(out)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  error: {str(e)[:300]}", flush=True)
        return False


def main():
    args = sys.argv[1:]
    save = "--save" in args
    args = [a for a in args if a != "--save"]
    sizes = [int(s) for s in args] or [16, 32, 64, 100, 120]
    dev = jax.devices()[0]
    print(f"device={dev} kind={dev.device_kind}", flush=True)
    try:
        print(f"memory_stats: {dev.memory_stats()}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"memory_stats unavailable: {e}", flush=True)
    best = 0
    for mib in sizes:
        ok = try_size(mib)
        print(f"VMEM scratch {mib} MiB: {'PASS' if ok else 'FAIL'}", flush=True)
        if not ok:
            break
        best = mib
    if save and best:
        # den_resident.vmem_budget() reads this per-device-kind cache;
        # keep ~10 MiB of Mosaic headroom off the raw acceptance (the
        # margin the v5e table entry carries: 120 accepted -> 110 used)
        import json

        path = pathlib.Path(__file__).parent.parent / ".cache"
        path.mkdir(exist_ok=True)
        f = path / "vmem_budget.json"
        data = {}
        if f.exists():
            data = json.loads(f.read_text())
        budget = max(best - 10, 1) * 1024 * 1024
        data[dev.device_kind.lower()] = budget
        f.write_text(json.dumps(data, indent=2))
        print(f"saved {dev.device_kind}: {budget} bytes -> {f}", flush=True)


if __name__ == "__main__":
    main()
