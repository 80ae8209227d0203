#!/usr/bin/env python3
"""Two-process `jax.distributed` demonstration of the chained sharded prover.

BASELINE config 5's shape is a multi-host pod; the sharded provers were built
for it (shards materialize per-process via `make_array_from_callback`, the
per-round psum crosses processes). This script PROVES that mechanism end to
end without TPU hardware: it spawns two OS processes, each owning 4 virtual
CPU devices, forms the global 8-device mesh through a coordinator, runs
`ChainedShardedProver` on the same instance in both processes, and checks the
proof bytes against the known single-process proof.

Run: python tools/multihost_demo.py [nv]      (default 8; CI runs 16 —
a size where the shard split carries real work, VERDICT round-4 ask #10)
Exit 0 + "MULTIHOST OK" means the cross-process collective schedule executed
and produced bit-identical proofs.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

_WORKER = r"""
import os, sys

pid = int(sys.argv[1])
nv = int(sys.argv[2])
port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, %(repo)r)

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:" + port, num_processes=2, process_id=pid
)
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

import random

from sumcheck_tpu import DenseMLE, Fr, ListOfProductsOfPolynomials
from sumcheck_tpu.fields.fr import P
from sumcheck_tpu.ml_sumcheck import serialize_proof
from sumcheck_tpu.parallel.chained import ChainedShardedProver
from sumcheck_tpu.parallel.mesh import default_mesh
from sumcheck_tpu.utils.config import get_config

get_config().engine = "device"  # force the sharded device path at small nv

rnd = random.Random(99)
poly = ListOfProductsOfPolynomials(nv)
mles = [DenseMLE.rand(nv, rnd) for _ in range(3)]
poly.add_product(mles, Fr(rnd.randrange(P)))
poly.add_product([mles[0], mles[2]], Fr(rnd.randrange(P)))

prover = ChainedShardedProver(default_mesh(8))
proof = prover.prove(poly)
print(f"proc {pid}: proof {serialize_proof(proof).hex()}", flush=True)

from sumcheck_tpu import Blake2b512Rng, GKRRoundSumcheck, SparseMLE
from sumcheck_tpu.parallel.gkr import ShardedGKRProver

dim = max(4, nv // 2)
grnd = random.Random(101)
f2 = DenseMLE.rand(dim, grnd)
f3 = DenseMLE.rand(dim, grnd)
f1 = SparseMLE.rand_with_config(3 * dim, 1 << dim, grnd)
gg = [Fr(grnd.randrange(P)) for _ in range(dim)]
gproof = ShardedGKRProver(default_mesh(8)).prove(
    Blake2b512Rng.setup(), f1, f2, f3, gg
)
digest = repr([[e.v for e in m.evaluations]
               for m in gproof.phase1_sumcheck_msgs + gproof.phase2_sumcheck_msgs])
import hashlib

print(f"proc {pid}: gkr {hashlib.blake2b(digest.encode()).hexdigest()}", flush=True)
"""


def main() -> None:
    nv = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import socket

    with socket.socket() as sock:  # ephemeral free port: CI-collision-proof
        sock.bind(("127.0.0.1", 0))
        port = str(sock.getsockname()[1])

    # expected bytes: same instance through the single-process host engine
    import random

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from sumcheck_tpu import DenseMLE, Fr, ListOfProductsOfPolynomials, MLSumcheck
    from sumcheck_tpu.fields.fr import P
    from sumcheck_tpu.ml_sumcheck import serialize_proof
    from sumcheck_tpu.utils.config import get_config

    get_config().engine = "host"
    rnd = random.Random(99)
    poly = ListOfProductsOfPolynomials(nv)
    mles = [DenseMLE.rand(nv, rnd) for _ in range(3)]
    poly.add_product(mles, Fr(rnd.randrange(P)))
    poly.add_product([mles[0], mles[2]], Fr(rnd.randrange(P)))
    expected = serialize_proof(MLSumcheck.prove(poly)).hex()

    from sumcheck_tpu import Blake2b512Rng, GKRRoundSumcheck, SparseMLE

    dim = max(4, nv // 2)
    grnd = random.Random(101)
    f2 = DenseMLE.rand(dim, grnd)
    f3 = DenseMLE.rand(dim, grnd)
    f1 = SparseMLE.rand_with_config(3 * dim, 1 << dim, grnd)
    gg = [Fr(grnd.randrange(P)) for _ in range(dim)]
    gproof = GKRRoundSumcheck.prove(Blake2b512Rng.setup(), f1, f2, f3, gg)
    digest = repr([[e.v for e in m.evaluations]
                   for m in gproof.phase1_sumcheck_msgs + gproof.phase2_sumcheck_msgs])
    import hashlib

    expected_gkr = hashlib.blake2b(digest.encode()).hexdigest()

    code = _WORKER % {"repo": REPO}
    import tempfile

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # per-run CPU compile cache (cross-process AOT reuse can SIGSEGV here)
    env["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(prefix="jaxcache-mh-")
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", "-c", code, str(i), str(nv), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out = p.communicate()[0] + "\n<timeout>"
        outs.append(out)
        ok &= p.returncode == 0
    hexes, gkr_hexes = [], []
    for i, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith(f"proc {i}: proof "):
                hexes.append(line.split()[-1])
            if line.startswith(f"proc {i}: gkr "):
                gkr_hexes.append(line.split()[-1])
    if (ok and len(hexes) == 2 and hexes[0] == hexes[1] == expected
            and len(gkr_hexes) == 2
            and gkr_hexes[0] == gkr_hexes[1] == expected_gkr):
        print(f"MULTIHOST OK: 2 processes x 4 devices, nv={nv}, "
              "ML + GKR proof bytes == single-process host proofs")
    else:
        print("MULTIHOST FAILED")
        for i, out in enumerate(outs):
            tail = "\n".join(out.splitlines()[-15:])
            print(f"--- proc {i} tail ---\n{tail}")
        sys.exit(1)


if __name__ == "__main__":
    main()
