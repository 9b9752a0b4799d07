"""Context / State / Integrator / Platform: the runtime layer.

Analog of OpenMM's Context + the reference's force-impl dispatch
(SlicedNonbondedForceImpl::calcForcesAndEnergy,
/root/reference/openmmapi/src/SlicedNonbondedForceImpl.cpp:135-142):

* ``includeDirect = includeDirectSpace and (groups >> forceGroup) & 1``
* reciprocal group defaults to the force group; reciprocal space contributes
  when its group bit is set

Each SlicedNonbondedForce is compiled once per (includeDirect,
includeReciprocal) combination into a jitted pure function; global parameters
(lambdas and offsets) are traced inputs, so ``setParameter`` and
``updateParametersInContext`` never recompile.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import engine as engine_mod
from ..ops import plan as plan_mod
from ..ops.plan import EWALD_METHODS
from .force import (HarmonicBondForce, NonbondedForce, OpenMMException,
                    SlicedNonbondedForce)
from ..ops.geometry import min_image


class Platform:
    """Named execution platform.

    * ``TPU``: default JAX backend, single precision by default.
    * ``Reference``: CPU backend, double precision — the parity oracle,
      mirroring the reference's Reference platform (SURVEY.md section 2.3).
    """

    _registry = {}
    _names = ("TPU", "Reference")

    def __init__(self, name, properties=None):
        self.name = name
        self.properties = dict(properties or {})

    @classmethod
    def getPlatformByName(cls, name):
        if name == "Reference":
            return cls("Reference", {"Precision": "double"})
        if name in ("TPU", "JAX"):
            return cls(name, {"Precision": "single"})
        raise OpenMMException(f"There is no platform called '{name}'")

    @classmethod
    def getNumPlatforms(cls):
        return len(cls._names)

    @classmethod
    def getPlatform(cls, index):
        try:
            return cls.getPlatformByName(cls._names[index])
        except IndexError:
            raise OpenMMException(
                f"There is no platform with index {index}")

    @classmethod
    def findPlatform(cls, kernelNames=()):
        """Fastest platform (OpenMM Platform::findPlatform analog); every
        kernel is implemented by both platforms here."""
        return cls.getPlatformByName("TPU")

    def getName(self):
        return self.name

    def getSpeed(self):
        """Relative speed estimate (OpenMM Platform::getSpeed semantics:
        larger = faster; Reference is the 1.0 anchor)."""
        return 1.0 if self.name == "Reference" else 100.0

    def supportsDoublePrecision(self):
        # the JAX backends run f64 (natively on CPU, emulated on TPU); the
        # Reference platform always does
        return True

    def getPropertyNames(self):
        return sorted(self.properties)

    def getPropertyDefaultValue(self, prop):
        return self.properties.get(prop, "")

    def getPropertyValue(self, context, prop):
        plat = context.getPlatform()
        if prop not in plat.properties:
            raise OpenMMException(
                f"Platform '{plat.name}' has no property '{prop}'")
        return plat.properties[prop]

    def setPropertyValue(self, context, prop, value):
        plat = context.getPlatform()
        if prop not in plat.properties:
            raise OpenMMException(
                f"Platform '{plat.name}' has no property '{prop}'")
        if prop == "Precision":
            raise OpenMMException(
                "Precision is fixed at Context creation; build a new "
                "Context with Platform properties instead.")
        plat.properties[prop] = value


class State:
    def __init__(self, positions=None, velocities=None, forces=None,
                 energy=None, derivatives=None, box=None):
        self._positions = positions
        self._velocities = velocities
        self._forces = forces
        self._energy = energy
        self._derivatives = derivatives or {}
        self._box = box

    def getPotentialEnergy(self):
        return self._energy

    def getForces(self):
        return self._forces

    def getPositions(self):
        return self._positions

    def getVelocities(self):
        return self._velocities

    def getEnergyParameterDerivatives(self):
        return dict(self._derivatives)

    def getPeriodicBoxVectors(self):
        return self._box


class VerletIntegrator:
    """Leapfrog Verlet integrator.  ``step()`` applies the system's distance
    constraints (M-SHAKE/RATTLE, SETTLE for rigid water) around each leapfrog
    update — on both the fused fast path and the per-step fallback
    (see Context._integrate)."""

    def __init__(self, step_size):
        self._dt = float(step_size)
        self._context = None

    def getStepSize(self):
        return self._dt

    def setStepSize(self, dt):
        self._dt = float(dt)

    def step(self, steps):
        if self._context is None:
            raise OpenMMException("Integrator is not bound to a context")
        self._context._integrate(steps, self._dt)


class _CompiledSliced:
    """Holds the plan + jit caches for one SlicedNonbondedForce."""

    def __init__(self, force, system, dtype):
        self.force = force
        self.plan = plan_mod.build_plan(force, system)
        self.dtype = dtype
        self.data = self._cast(engine_mod.plan_data(self.plan))
        self._fns = {}
        self.capacity_scale = 1

    def _cast(self, data):
        return {k: (v.astype(self.dtype) if v.dtype.kind == "f" else v)
                for k, v in data.items()}

    def refresh(self, force, system):
        self.plan = plan_mod.refresh_plan(self.plan, force, system)
        self.data = self._cast(engine_mod.plan_data(self.plan))
        # jitted fns close over static config only; structural config is
        # unchanged by updateParametersInContext, so caches stay valid

    def cell_capacity(self):
        """Static cell capacity after overflow-driven growth (None = the
        engine default)."""
        if self.capacity_scale == 1 or self.plan.box0 is None:
            return None
        from ..ops.neighbors import choose_cell_grid
        cfg = choose_cell_grid(self.plan.box0, self.plan.cutoff,
                               self.plan.num_particles)
        if cfg is None:
            return None
        return min(cfg[1] * self.capacity_scale, self.plan.num_particles)

    def grow_capacity(self):
        """Double the cell capacity after an overflow (clustered system
        denser than the uniform-density sizing).  Returns False once the
        capacity already holds every particle (overflow impossible)."""
        cap = self.cell_capacity()
        if cap is not None and cap >= self.plan.num_particles:
            return False
        self.capacity_scale *= 2
        # compiled fns for superseded capacities are never called again;
        # drop them so overflow-driven growth does not retain executables
        self._fns = {k: v for k, v in self._fns.items()
                     if k[2] == self.capacity_scale}
        return True

    def fn(self, include_direct, include_reciprocal):
        key = (include_direct, include_reciprocal, self.capacity_scale)
        if key not in self._fns:
            compute = engine_mod.make_compute(
                self.plan, include_direct, include_reciprocal,
                cell_capacity=self.cell_capacity(), with_aux=True)
            self._fns[key] = jax.jit(compute)
        return self._fns[key]


class Context:
    def __init__(self, system, integrator, platform=None, properties=None):
        self._system = system
        self._integrator = integrator
        integrator._context = self
        self._platform = platform or Platform.getPlatformByName("TPU")
        if properties:
            self._platform.properties.update(properties)
        precision = self._platform.properties.get("Precision", "single")
        if precision not in ("single", "mixed", "double"):
            raise OpenMMException(
                f"Unsupported Precision '{precision}' (single|mixed|double)")
        self._precision = precision
        self._dtype = jnp.float64 if precision == "double" else jnp.float32
        n = system.getNumParticles()
        self._positions = np.zeros((n, 3))
        self._velocities = np.zeros((n, 3))
        self._box = np.array(system.getDefaultPeriodicBoxVectors(), dtype=np.float64)
        self._parameters = {}
        self._compiled = {}
        self._initialize()

    # ------------------------------------------------------------ lifecycle

    def _initialize(self):
        self._compiled = {}
        self._constraint_clusters = "unset"
        self._mol_ids = None
        params = {}
        for force in self._system.getForces():
            if isinstance(force, SlicedNonbondedForce):
                self._compiled[id(force)] = _CompiledSliced(
                    force, self._system, self._dtype)
            if isinstance(force, NonbondedForce):
                for i in range(force.getNumGlobalParameters()):
                    params.setdefault(force.getGlobalParameterName(i),
                                      force.getGlobalParameterDefaultValue(i))
        old = self._parameters
        self._parameters = {k: old.get(k, v) for k, v in params.items()}

    def reinitialize(self, preserveState=False):
        positions = self._positions.copy()
        velocities = self._velocities.copy()
        box = self._box.copy()
        parameters = dict(self._parameters)
        self._parameters = {}
        self._box = np.array(self._system.getDefaultPeriodicBoxVectors(),
                             dtype=np.float64)
        self._initialize()
        if preserveState:
            self._positions = positions
            self._velocities = velocities
            self._box = box
            for k in list(self._parameters):
                if k in parameters:
                    self._parameters[k] = parameters[k]

    def getSystem(self):
        return self._system

    def getIntegrator(self):
        return self._integrator

    def getPlatform(self):
        return self._platform

    # ----------------------------------------------------------- positions

    def setPositions(self, positions):
        arr = np.asarray([[p[0], p[1], p[2]] for p in positions], dtype=np.float64)
        if arr.shape != (self._system.getNumParticles(), 3):
            raise OpenMMException("setPositions: wrong number of positions")
        self._positions = arr

    def setVelocities(self, velocities):
        self._velocities = np.asarray(velocities, dtype=np.float64).reshape(-1, 3)

    def setVelocitiesToTemperature(self, temperature, seed=0):
        rng = np.random.default_rng(seed)
        kB = 8.31446261815324e-3  # kJ/mol/K
        masses = np.array([self._system.getParticleMass(i)
                           for i in range(self._system.getNumParticles())])
        sigma = np.sqrt(kB * temperature / np.maximum(masses, 1e-12))
        self._velocities = rng.normal(size=(len(masses), 3)) * sigma[:, None]

    def setPeriodicBoxVectors(self, a, b, c):
        self._box = np.array([a, b, c], dtype=np.float64)

    def getPeriodicBoxVectors(self):
        return [tuple(v) for v in self._box]

    # ---------------------------------------------------------- parameters

    def setParameter(self, name, value):
        if name not in self._parameters:
            raise OpenMMException(f"There is no parameter called '{name}'")
        self._parameters[name] = float(value)

    def getParameter(self, name):
        if name not in self._parameters:
            raise OpenMMException(f"There is no parameter called '{name}'")
        return self._parameters[name]

    def getParameters(self):
        return dict(self._parameters)

    # -------------------------------------------------------------- compute

    def _group_mask(self, groups):
        if groups is None:
            return (1 << 32) - 1
        if isinstance(groups, (set, frozenset, list, tuple)):
            mask = 0
            for g in groups:
                mask |= 1 << g
            return mask
        return int(groups) & ((1 << 32) - 1)

    def _check_box(self, force, comp=None):
        method = force.getNonbondedMethod()
        if method in (NonbondedForce.CutoffPeriodic,) + tuple(EWALD_METHODS):
            min_size = 1.999999 * force.getCutoffDistance()
            if (self._box[0][0] < min_size or self._box[1][1] < min_size
                    or self._box[2][2] < min_size):
                raise OpenMMException(
                    "The periodic box size has decreased to less than twice "
                    "the nonbonded cutoff.")
            # the cell grid is sized from the plan's default box; if the
            # runtime box shrank enough that a cell's perpendicular width
            # falls below the cutoff, in-range pairs would be silently
            # missed (the reference rebuilds its neighbor list from the
            # current box each evaluation) — reject and ask for reinit
            if comp is not None and comp.plan.box0 is not None:
                from ..ops.neighbors import (_perpendicular_widths,
                                             choose_cell_grid)
                plan = comp.plan
                if (plan.num_particles
                        >= engine_mod._CELL_LIST_MIN_PARTICLES):
                    cfg = choose_cell_grid(plan.box0, plan.cutoff,
                                           plan.num_particles)
                    if cfg is not None:
                        widths = (_perpendicular_widths(self._box)
                                  / np.asarray(cfg[0]))
                        if np.any(widths < plan.cutoff):
                            raise OpenMMException(
                                "The periodic box has shrunk below the "
                                "neighbor-cell grid sized from the default "
                                "box; call reinitialize() after changing "
                                "the box vectors.")

    def _check_exclusion_span(self, comp):
        """The fused TPU exclusion-correction path requires excluded pairs
        within one cell width (true for bonded exclusions in any molecular
        system); reject pathological systems instead of mis-computing."""
        import jax

        plan = comp.plan
        if (jax.default_backend() != "tpu"
                or plan.method not in EWALD_METHODS
                or len(plan.exclusion_pairs) == 0
                or self._dtype != jnp.float32
                or plan.num_particles < engine_mod._CELL_LIST_MIN_PARTICLES):
            return
        from ..ops.neighbors import choose_cell_grid
        cfg = choose_cell_grid(plan.box0, plan.cutoff, plan.num_particles)
        if cfg is None:
            return  # all-pairs engine; no locality requirement
        counts = np.asarray(cfg[0])
        widths = np.diag(self._box) / counts
        dr = (self._positions[plan.exclusion_pairs[:, 0]]
              - self._positions[plan.exclusion_pairs[:, 1]])
        dr -= np.diag(self._box) * np.floor(dr / np.diag(self._box) + 0.5)
        if np.any(np.abs(dr) >= widths):
            raise OpenMMException(
                "SlicedNonbondedForce: an excluded pair spans more than one "
                "neighbor-list cell; the TPU fast path requires excluded "
                "pairs to be bonded-range. Use the Reference platform.")

    def _gvals(self, compiled):
        return jnp.asarray([self._parameters[name]
                            for name in compiled.plan.global_names],
                           dtype=compiled.dtype)

    def _evaluate(self, groups_mask):
        """Sum energies/forces/derivatives over all forces."""
        n = self._system.getNumParticles()
        total_energy = 0.0
        total_forces = np.zeros((n, 3))
        # every requested derivative appears in the map, zero when its force
        # group was not evaluated (OpenMM map semantics)
        derivs = {}
        for comp in self._compiled.values():
            for name in comp.plan.deriv_names:
                derivs.setdefault(name, 0.0)
        pos64 = self._positions
        for force in self._system.getForces():
            if isinstance(force, SlicedNonbondedForce):
                comp = self._compiled[id(force)]
                include_direct = (force.getIncludeDirectSpace()
                                  and bool(groups_mask >> force.getForceGroup() & 1))
                recip_group = force.getReciprocalSpaceForceGroup()
                if recip_group < 0:
                    recip_group = force.getForceGroup()
                include_reciprocal = bool(groups_mask >> recip_group & 1)
                if force.getNonbondedMethod() not in EWALD_METHODS:
                    include_reciprocal = False
                if not (include_direct or include_reciprocal):
                    continue
                self._check_box(force, comp)
                self._check_exclusion_span(comp)
                positions = jnp.asarray(pos64, dtype=comp.dtype)
                box = jnp.asarray(self._box, dtype=comp.dtype)
                gvals = self._gvals(comp)
                # cell-capacity overflow (clustered system denser than the
                # uniform-density sizing) auto-grows the slot table and
                # re-traces — never silently drop atoms (the reference's
                # voxel hash is exact every call,
                # ReferenceNonbondedSlicingKernels.cpp:197)
                while True:
                    fn = comp.fn(include_direct, include_reciprocal)
                    slice_e, forces, aux = fn(positions, box, gvals,
                                              comp.data)
                    if int(aux["overflow"]) == 0:
                        break
                    if not comp.grow_capacity():
                        raise OpenMMException(
                            "Internal error: cell capacity covers all "
                            "particles yet the occupancy table overflowed")
                from ..ops.params import slice_lambdas
                lam = slice_lambdas(comp.plan.lam_source, gvals)
                total_energy += float(engine_mod.contract_energy(slice_e, lam))
                total_forces += np.asarray(forces, dtype=np.float64)
                if comp.plan.deriv_names:
                    dvals = np.asarray(engine_mod.parameter_derivatives(
                        slice_e, comp.plan.deriv_mask))
                    for name, val in zip(comp.plan.deriv_names, dvals):
                        derivs[name] = derivs.get(name, 0.0) + float(val)
            elif isinstance(force, HarmonicBondForce):
                if not (groups_mask >> force.getForceGroup() & 1):
                    continue
                e, f = self._harmonic_bonds(force)
                total_energy += e
                total_forces += f
        return total_energy, total_forces, derivs

    def _harmonic_bonds(self, force):
        if force.getNumBonds() == 0:
            return 0.0, 0.0
        bonds = np.array([force.getBondParameters(i)
                          for i in range(force.getNumBonds())])
        i = bonds[:, 0].astype(int)
        j = bonds[:, 1].astype(int)
        r0 = bonds[:, 2]
        k = bonds[:, 3]
        dr = self._positions[i] - self._positions[j]
        if force.usesPeriodicBoundaryConditions():
            dr = np.asarray(min_image(jnp.asarray(dr), jnp.asarray(self._box)))
        r = np.sqrt(np.sum(dr * dr, axis=-1))
        e = float(np.sum(0.5 * k * (r - r0) ** 2))
        dedr = k * (r - r0) / np.maximum(r, 1e-12)
        f = np.zeros_like(self._positions)
        np.add.at(f, i, -dedr[:, None] * dr)
        np.add.at(f, j, dedr[:, None] * dr)
        return e, f

    def _molecule_ids(self):
        """Connected components over constraints, harmonic bonds, and
        nonbonded exceptions — OpenMM's molecule definition for
        enforcePeriodicBox.  Cached (structural)."""
        cached = getattr(self, "_mol_ids", None)
        if cached is not None:
            return cached
        n = self._system.getNumParticles()
        parent = np.arange(n)

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra

        for i in range(self._system.getNumConstraints()):
            a, b, _ = self._system.getConstraintParameters(i)
            union(a, b)
        for force in self._system.getForces():
            if isinstance(force, HarmonicBondForce):
                for i in range(force.getNumBonds()):
                    a, b = force.getBondParameters(i)[:2]
                    union(int(a), int(b))
            elif isinstance(force, NonbondedForce):
                for i in range(force.getNumExceptions()):
                    a, b = force.getExceptionParameters(i)[:2]
                    union(int(a), int(b))
        roots = np.array([find(i) for i in range(n)])
        _, mol = np.unique(roots, return_inverse=True)
        self._mol_ids = mol
        return mol

    def _wrap_molecules(self, positions):
        """Translate each molecule by whole box vectors so its geometric
        center lies in the primary box (OpenMM enforcePeriodicBox
        semantics: molecules stay whole)."""
        mol = self._molecule_ids()
        n_mol = int(mol.max()) + 1
        counts = np.bincount(mol, minlength=n_mol)[:, None]
        centers = np.zeros((n_mol, 3))
        np.add.at(centers, mol, positions)
        centers /= counts
        frac = centers @ np.linalg.inv(self._box)
        shift = np.floor(frac) @ self._box
        return positions - shift[mol]

    def getState(self, getPositions=False, getVelocities=False, getForces=False,
                 getEnergy=False, getParameterDerivatives=False,
                 enforcePeriodicBox=False, groups=None):
        needs_compute = getForces or getEnergy or getParameterDerivatives
        energy = forces = None
        derivs = {}
        if needs_compute:
            energy, forces, derivs = self._evaluate(self._group_mask(groups))
        out_pos = None
        if getPositions:
            out_pos = self._positions
            if enforcePeriodicBox:
                out_pos = self._wrap_molecules(out_pos)
        return State(
            positions=[tuple(p) for p in out_pos] if getPositions else None,
            velocities=[tuple(v) for v in self._velocities] if getVelocities else None,
            forces=[tuple(f) for f in forces] if getForces else None,
            energy=energy if getEnergy else None,
            derivatives=derivs,
            box=[tuple(v) for v in self._box],
        )

    # -------------------------------------------------- checkpoint / resume

    def createCheckpoint(self):
        """Dynamic state (positions, velocities, box, parameters) as bytes."""
        from ..runtime.checkpoint import create_checkpoint
        return create_checkpoint(self)

    def loadCheckpoint(self, blob):
        from ..runtime.checkpoint import load_checkpoint
        load_checkpoint(self, blob)

    # ---------------------------------------------- force-facing internals

    def _update_force_parameters(self, force):
        if isinstance(force, SlicedNonbondedForce):
            comp = self._compiled.get(id(force))
            if comp is None:
                raise OpenMMException("updateParametersInContext: force is not in this context")
            comp.refresh(force, self._system)
        # HarmonicBondForce reads its parameters at evaluation time

    def _get_pme_parameters(self, force, dispersion=False):
        comp = self._compiled.get(id(force))
        if comp is None:
            raise OpenMMException("getPMEParametersInContext: force is not in this context")
        plan = comp.plan
        if dispersion:
            if plan.method != NonbondedForce.LJPME:
                raise OpenMMException(
                    "getPMEParametersInContext: This Context is not using LJPME")
            return (plan.dispersion_alpha,) + tuple(plan.dispersion_grid)
        if plan.method not in (NonbondedForce.PME, NonbondedForce.LJPME):
            raise OpenMMException(
                "getPMEParametersInContext: This Context is not using PME or LJPME")
        return (plan.ewald_alpha,) + tuple(plan.pme_grid)

    # ----------------------------------------------------------- dynamics

    def _fast_md_runner(self, dt):
        """Fused device-resident MD loop (runtime/fastpath.py) when the
        system shape allows it: exactly one SlicedNonbondedForce (all groups
        active by construction of step()), plus optional HarmonicBondForces.
        Returns None when ineligible — callers fall back to the per-step
        host loop.  This makes integrator.step() the production path
        (the reference's integrator.step() is its production path via
        SlicedNonbondedForceImpl::calcForcesAndEnergy,
        openmmapi/src/SlicedNonbondedForceImpl.cpp:135-142)."""
        sliced = [f for f in self._system.getForces()
                  if isinstance(f, SlicedNonbondedForce)]
        others = [f for f in self._system.getForces()
                  if not isinstance(f, (SlicedNonbondedForce,
                                        HarmonicBondForce))]
        if len(sliced) != 1 or others:
            return None
        if not sliced[0].getIncludeDirectSpace():
            return None  # the fused step always evaluates direct space
        comp = self._compiled[id(sliced[0])]
        plan = comp.plan
        if comp.dtype != jnp.float32:
            # the f64 Reference-oracle path stays on the host loop (the fused
            # Pallas kernel is an f32 fast path)
            return None
        if plan.box0 is None or not np.allclose(
                self._box, np.asarray(plan.box0),
                rtol=0.0, atol=1e-6 * float(np.max(np.abs(self._box)))):
            return None
        cached = getattr(comp, "_md_cache", None)
        if cached is not None and cached[0] == dt:
            return cached[1]
        from ..runtime.fastpath import make_md_step
        bonds = []
        bonds_periodic = False
        for f in self._system.getForces():
            if isinstance(f, HarmonicBondForce):
                bonds.extend(f.getBondParameters(i)
                             for i in range(f.getNumBonds()))
                bonds_periodic |= f.usesPeriodicBoundaryConditions()
        masses = np.array([self._system.getParticleMass(i)
                           for i in range(self._system.getNumParticles())])
        constraints = self._clustered_constraints()
        reuse = 10

        def runner(steps):
            nonlocal reuse
            box = jnp.asarray(self._box, comp.dtype)
            gvals = self._gvals(comp)
            struct = comp.__dict__.setdefault(
                "_md_struct", {"cell_cap": None})
            while True:
                # (re)create inside the loop: run_scan donates pos/vel, so a
                # guard-tripped attempt leaves them deleted (structure guards
                # fire AFTER the scan, so a tripped attempt never advances
                # self._positions — the retry reproduces the same trajectory)
                pos = jnp.asarray(self._positions, comp.dtype)
                vel = jnp.asarray(self._velocities, comp.dtype)
                key = (reuse, struct["cell_cap"])
                run = comp.__dict__.setdefault("_md_runs", {}).get(key)
                if run is None:
                    run = make_md_step(plan, masses, dt, dtype=comp.dtype,
                                       bonds=bonds,
                                       bonds_periodic=bonds_periodic,
                                       constraints=constraints,
                                       reuse_steps=reuse,
                                       cell_capacity=struct["cell_cap"],
                                       mixed_precision=(
                                           self._precision == "mixed"))
                    comp._md_runs[key] = run
                try:
                    pos2, vel2, _ = run(pos, vel, box, gvals, comp.data,
                                        steps)
                    break
                except OpenMMException as exc:
                    # structure guards auto-degrade: skin violations halve
                    # the rebuild-reuse window, overflows grow the static
                    # structure (mirrors _evaluate's cell auto-grow); box
                    # guards and anything unexpected propagate
                    comp._md_runs.pop(key, None)
                    msg = str(exc)
                    if "skin violation" in msg and reuse > 1:
                        reuse = max(1, reuse // 2)
                    elif ("capacity overflow" in msg
                          and (struct["cell_cap"] or 0) < plan.num_particles):
                        cap = run.config.get("capacity", 0) or 32
                        struct["cell_cap"] = min(2 * cap, plan.num_particles)
                    else:
                        raise
            self._positions = np.asarray(pos2, dtype=np.float64)
            self._velocities = np.asarray(vel2, dtype=np.float64)

        comp._md_cache = (dt, runner)
        return runner

    def _clustered_constraints(self):
        """System constraints as (pairs, dists, mask) M-SHAKE clusters, or
        None.  Cached per Context (constraints are structural)."""
        cached = getattr(self, "_constraint_clusters", "unset")
        if cached != "unset":
            return cached
        from ..runtime.constraints import cluster_constraints
        cons = [self._system.getConstraintParameters(i)
                for i in range(self._system.getNumConstraints())]
        self._constraint_clusters = cluster_constraints(
            cons, self._system.getNumParticles())
        return self._constraint_clusters

    def _integrate(self, steps, dt):
        fast = self._fast_md_runner(dt)
        if fast is not None:
            fast(int(steps))
            return
        masses = np.array([self._system.getParticleMass(i)
                           for i in range(self._system.getNumParticles())])
        inv_m = np.where(masses > 0, 1.0 / np.maximum(masses, 1e-300), 0.0)
        constraints = self._clustered_constraints()
        proj_x = proj_v = None
        if constraints is not None:
            from ..runtime.constraints import make_constrainer
            # f64 regardless of compiled dtype: this host fallback path is
            # off the fused fast path, and round-tripping the f64 host
            # positions through f32 every step would add rounding the
            # unconstrained branch does not incur
            proj_x, proj_v = make_constrainer(
                constraints[0], constraints[1], masses,
                self._system.getNumParticles(), dtype=jnp.float64,
                mask=constraints[2])
        for _ in range(steps):
            _, forces, _ = self._evaluate((1 << 32) - 1)
            self._velocities += dt * forces * inv_m[:, None]
            if proj_x is None:
                self._positions += dt * self._velocities
            else:
                # SHAKE/RATTLE around the leapfrog update (same staging as
                # runtime/fastpath.py integrate())
                pos = jnp.asarray(self._positions, jnp.float64)
                vel = jnp.asarray(self._velocities, jnp.float64)
                pos_new = proj_x(pos, pos + dt * vel)
                vel = proj_v(pos_new, (pos_new - pos) / dt)
                self._positions = np.asarray(pos_new, dtype=np.float64)
                self._velocities = np.asarray(vel, dtype=np.float64)
