#!/usr/bin/env python
"""Multi-chip sharded search on a device mesh.

Shards a corpus over the mesh's data axis and runs the two production
search tiers — exact (bf16/f32 scan) and quantized (int8 two-stage with
f32 refinement) — as ONE ``shard_map`` program each: every chip scans its
shard, the per-shard top-k (``O(devices * k)`` rows, never the corpus)
all-gathers over ICI, and the global merge runs replicated.  Results are
asserted identical to a single-device search over the same rows.

On real multi-chip hardware this runs as-is on the TPU mesh.  Without one
(e.g. this dev box's single chip) it demonstrates the same compiled
program on 8 virtual CPU devices:

    python examples/multichip_search.py
"""

import os
import sys

import numpy as np


def ensure_devices() -> None:
    """Use the real TPU mesh when >=2 chips exist, else 8 virtual CPUs."""
    import jax

    if os.environ.get("_DEWI_VIRTUAL_MESH") == "1":
        # Child of the re-exec below.  Some site hooks ignore the
        # JAX_PLATFORMS env var, so pin the platform at config level
        # BEFORE the backend initializes.
        jax.config.update("jax_platforms", "cpu")
        return

    try:
        n = jax.device_count()
    except Exception:
        n = 1
    if n >= 2:
        return
    # Too late to re-init jax in-process: re-exec with the virtual mesh.
    if os.environ.get("_DEWI_VIRTUAL_MESH") != "1":
        os.environ["_DEWI_VIRTUAL_MESH"] = "1"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        )
        os.environ["JAX_PLATFORMS"] = "cpu"
        print("single device found: re-exec on 8 virtual CPU devices\n")
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main() -> None:
    ensure_devices()
    import jax

    from dewi_tpu.index import ExactIndex, QuantizedIndex
    from dewi_tpu.index.store import DocStore
    from dewi_tpu.parallel import (
        ShardedExactSearcher,
        ShardedQuantizedSearcher,
        make_mesh,
    )

    n_dev = jax.device_count()
    mesh = make_mesh(n_data=n_dev, n_model=1)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"on {jax.devices()[0].platform}")

    rng = np.random.default_rng(0)
    n = int(os.environ.get("DEWI_EXAMPLE_DOCS", 8 * 1024))
    n -= n % n_dev  # corpus shards evenly over the data axis
    d, k = 64, 10
    emb = rng.normal(size=(n, d)).astype(np.float32)
    pay = np.abs(rng.normal(size=(n, 8))).astype(np.float32)
    ids = [f"doc{i}" for i in range(n)]
    queries = rng.normal(size=(4, d)).astype(np.float32)

    # --- exact tier, sharded ------------------------------------------------
    store = DocStore(dim=d)
    store.add_batch(ids, emb, pay)
    exact = ShardedExactSearcher(store, mesh, k=k)
    s_scores, s_idx = exact.search_batch(queries, eta=0.25,
                                         entropy_pref=0.1)

    local = ExactIndex(dim=d)
    local.store.add_batch(ids, emb, pay)
    local.build()
    l_scores, l_idx = local.search_batch(queries, k=k, eta=0.25,
                                         entropy_pref=0.1)
    np.testing.assert_array_equal(np.asarray(s_idx), np.asarray(l_idx))
    print(f"exact tier: sharded top-{k} == single-device top-{k} "
          f"over {n} docs x {n_dev} shards")

    # --- quantized serving tier, sharded -------------------------------------
    store2 = DocStore(dim=d)
    store2.add_batch(ids, emb, pay)
    quant = ShardedQuantizedSearcher(store2, mesh, k=k, refine_factor=8)
    q_scores, q_idx = quant.search_batch(queries, eta=0.25,
                                         entropy_pref=0.1)

    lq = QuantizedIndex(dim=d)
    lq.store.add_batch(ids, emb, pay)
    lq.build()
    lq_scores, lq_idx = lq.search_batch(queries, k=k, eta=0.25,
                                        entropy_pref=0.1)
    match = (np.asarray(q_idx) == np.asarray(lq_idx)).mean()
    print(f"quantized tier: sharded results match local on "
          f"{match:.0%} of top-{k} slots (int8 stage-1 ties can reorder)")

    top = [ids[i] for i in np.asarray(s_idx)[0]]
    print(f"\nquery 0 top-{k}: {top}")


if __name__ == "__main__":
    main()
