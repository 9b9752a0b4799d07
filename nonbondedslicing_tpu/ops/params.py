"""Runtime parameter resolution.

Analog of the reference's ``computeParameters``
(ReferenceNonbondedSlicingKernels.cpp:339-392): apply global-parameter offsets
to base charges/sigmas/epsilons and pack particle parameters as
(sigma/2, 2*sqrt(epsilon), charge) and 1-4 parameters as
(sigma, 4*epsilon, chargeProd).  Here the global parameters are traced JAX
scalars, so lambda/offset changes never recompile.
"""

import jax.numpy as jnp


def particle_params(data, gvals):
    """Return (charge, sig_half, eps_sqrt2) arrays of shape (N,)."""
    base = data["base_params"]
    charge = base[:, 0] + gvals @ data["charge_offsets"]
    sigma = base[:, 1] + gvals @ data["sigma_offsets"]
    epsilon = base[:, 2] + gvals @ data["epsilon_offsets"]
    return charge, 0.5 * sigma, 2.0 * jnp.sqrt(epsilon)


def nb14_params(data, gvals):
    """Return (sigma, 4*epsilon, chargeProd) arrays of shape (M,)."""
    base = data["nb14_base"]
    charge = base[:, 0] + gvals @ data["nb14_charge_offsets"]
    sigma = base[:, 1] + gvals @ data["nb14_sigma_offsets"]
    epsilon = base[:, 2] + gvals @ data["nb14_epsilon_offsets"]
    return sigma, 4.0 * epsilon, charge


def slice_lambdas(lam_source, gvals):
    """(S, 2) lambda table; entries default to 1 when no scaling parameter is
    bound (ReferenceNonbondedSlicingKernels.cpp:343-347)."""
    src = jnp.asarray(lam_source)
    if gvals.shape[0] == 0:
        return jnp.ones(src.shape, dtype=gvals.dtype)
    safe = jnp.maximum(src, 0)
    vals = gvals[safe]
    return jnp.where(src >= 0, vals, jnp.ones_like(vals))


def lambda_matrix(lam, slice_table, term):
    """(nsub, nsub) lambda lookup for one term."""
    return lam[:, term][jnp.asarray(slice_table)]
