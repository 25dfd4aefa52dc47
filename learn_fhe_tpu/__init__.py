"""learn-fhe-tpu: a TPU-native FHE primitive library in JAX/Pallas.

A from-scratch re-design of the capabilities of the `learn-fhe` Rust reference
(three schemes -- CKKS, TFHE, FHEW -- plus BGV, over a shared negacyclic-ring / RNS /
gadget-decomposition substrate), built TPU-first:

- polynomials are batched ``jnp`` arrays with a trailing coefficient axis,
- modular arithmetic runs on packed u64 lanes (Montgomery / Shoup reductions
  built from 32-bit limb products, matching TPU integer ALUs),
- NTT butterflies are vectorized stages (and Pallas kernels for the hot path),
- every scheme op carries a leading vmap-able batch axis,
- multi-chip scaling is expressed with `jax.sharding` meshes + collectives.

Layer map (mirrors SURVEY.md section 1):
  utils/   -- host-side: prime search, RNS tables, big-int CRT, distributions
  ops/     -- device kernels: modular ops, NTT, FFT64, decompose, automorphism
  models/  -- the schemes: ckks/, tfhe/, fhew/, bgv/
  parallel/-- mesh construction, sharded batched-bootstrap pipelines
"""

import jax

# The whole library computes on u64/f64 lanes; JAX defaults to 32-bit.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
