"""Periodic geometry helpers (minimum image, reciprocal box vectors)."""

import jax.numpy as jnp


def min_image(dr, box):
    """Apply OpenMM's reduced-form triclinic minimum-image convention.

    ``dr`` has shape (..., 3); ``box`` is (3, 3) row vectors in reduced form
    (a along x, b in the xy plane).  Mirrors
    ``ReferenceForce::getDeltaRPeriodic``: subtract rounded multiples of the
    box vectors in the order c, b, a.
    """
    for axis in (2, 1, 0):
        n = jnp.floor(dr[..., axis] / box[axis, axis] + 0.5)
        dr = dr - n[..., None] * box[axis]
    return dr


def recip_box_vectors(box):
    """Reciprocal (inverse-transpose) row vectors of a reduced triclinic box.

    Mirrors invert_box_vectors (ReferencePME.cpp:186-194); fractional
    coordinates are then ``positions @ recip``.
    """
    det = box[0, 0] * box[1, 1] * box[2, 2]
    scale = 1.0 / det
    zero = jnp.zeros((), dtype=box.dtype)
    r0 = jnp.stack([box[1, 1] * box[2, 2], zero, zero]) * scale
    r1 = jnp.stack([-box[1, 0] * box[2, 2], box[0, 0] * box[2, 2], zero]) * scale
    r2 = jnp.stack([box[1, 0] * box[2, 1] - box[1, 1] * box[2, 0],
                    -box[0, 0] * box[2, 1], box[0, 0] * box[1, 1]]) * scale
    return jnp.stack([r0, r1, r2])


def box_volume(box):
    return box[0, 0] * box[1, 1] * box[2, 2]
