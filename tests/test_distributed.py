"""Two-process 'pod' rendering over jax.distributed (the multi-host DCN
tier exercised at the process boundary on localhost): both workers join a
coordinator, assemble a global batch from per-process local data, render
it through sharded_batch_render, and each writes only its own shard — the
results must equal a single-process render of the same batch."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
def test_two_process_pod_matches_single(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    # The workers must import raw2film_tpu regardless of how this process
    # found it (editable install, cwd, conftest path hack).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    out0 = np.load(tmp_path / "out_0.npy")
    out1 = np.load(tmp_path / "out_1.npy")
    got = np.concatenate([out0, out1], axis=0)
    assert got.shape == (4, 3, 64, 96) and got.dtype == np.uint8

    # Single-process reference of the SAME global batch.
    from raw2film_tpu.film import chain as fchain
    from raw2film_tpu.film.loader import load_film_stocks
    from raw2film_tpu.parallel.mesh import batch_render_fn
    from raw2film_tpu.pipeline.params import ImageParams, ProfileParams, merge_params
    from raw2film_tpu.pipeline.render import build_render_config, make_film_bundle

    stocks = load_film_stocks()
    neg = stocks["Kodak Portra 400"]
    prt = stocks["Fuji Crystal Archive Maxima"]
    neg_p = fchain.build_negative_params(neg)
    prt_p = fchain.build_print_params(neg, prt, neg_params=neg_p)
    out_p = fchain.build_output_params(neg, prt, prt_p, neg_p)
    bundle = make_film_bundle(neg_p, prt_p, out_p)
    merged = merge_params(ProfileParams(), ImageParams())
    merged.update(halation=True, grain=0, sharpness=True)
    h, w = 64, 96
    cfg = build_render_config(neg, prt, "print", max(h, w) / 36.0, merged)
    rng = np.random.default_rng(0)
    xyz = np.abs(rng.normal(0.2, 0.1, (4, 3, h, w))).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    import jax.numpy as jnp

    want = np.asarray(
        jax.jit(batch_render_fn(cfg))(jnp.asarray(xyz), bundle, keys)
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, diff.max()
