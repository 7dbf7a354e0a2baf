"""Host-CPU pinning for eager array work.

On the TPU relay every eager op is a separate program upload + ~25-30 ms
round trip (a one-shot whitening `eigh` measured 2 MB of executable and
the dataset-init phase 11-110 s of first-contact + upload wall, r5
recon). Anything that is (a) eager, (b) small, and (c) consumed by host
numpy belongs on the in-process CPU backend; only bulk solver inputs
should ever move to the accelerator.
"""

from __future__ import annotations

import contextlib
import sys

import jax


def host_cpu_ctx():
    """Context manager pinning eager jax ops to the host CPU backend.

    Warns loudly when no CPU backend is registered — that silently
    degrades eager precompute to relay latency PER OP; keep 'cpu' in
    jax_platforms (apps/common.setup_jax appends it).
    """
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        return jax.default_device(cpu)
    except Exception:
        print("  WARNING: no CPU backend registered — eager precompute "
              "runs on the accelerator (~25 ms relay latency PER OP; "
              "keep 'cpu' in jax_platforms, see apps/common.setup_jax)",
              file=sys.stderr, flush=True)
        return contextlib.nullcontext()
