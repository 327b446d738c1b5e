"""Worker for tests/test_distributed.py: one process of a 2-process
localhost 'pod'. Renders its slice of a global batch and writes the local
outputs to .npy. Must be a separate script: jax.distributed.initialize has
to run before any backend touch, per process."""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
outdir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from raw2film_tpu.parallel.distributed import (  # noqa: E402
    distributed_batch_render,
    init_process,
)

init_process(f"127.0.0.1:{port}", nproc, pid)

import numpy as np  # noqa: E402

from raw2film_tpu.film import chain as fchain  # noqa: E402
from raw2film_tpu.film.loader import load_film_stocks  # noqa: E402
from raw2film_tpu.parallel.mesh import make_mesh  # noqa: E402
from raw2film_tpu.pipeline.params import (  # noqa: E402
    ImageParams,
    ProfileParams,
    merge_params,
)
from raw2film_tpu.pipeline.render import (  # noqa: E402
    build_render_config,
    make_film_bundle,
)

assert jax.process_count() == nproc
assert jax.device_count() == 2 * nproc

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

# Global batch of 4 images, process-major: process p owns images [2p, 2p+1].
b_global = 4
b_local = b_global // nproc
rng = np.random.default_rng(0)
all_xyz = np.abs(rng.normal(0.2, 0.1, (b_global, 3, h, w))).astype(np.float32)
all_keys = np.asarray(jax.random.split(jax.random.PRNGKey(0), b_global))
lo = pid * b_local
local_xyz = all_xyz[lo : lo + b_local]
local_keys = all_keys[lo : lo + b_local]

mesh = make_mesh(2 * nproc, batch=2 * nproc, space=1)
local_out = distributed_batch_render(mesh, cfg, local_xyz, bundle, local_keys)
np.save(os.path.join(outdir, f"out_{pid}.npy"), local_out)
print(f"worker {pid}: wrote {local_out.shape}", flush=True)
