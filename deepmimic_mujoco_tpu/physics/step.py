"""Engine: the fused forward-dynamics pipeline and integrators.

One ``Engine`` per :class:`PhysicsModel` precomputes all static tables
(collision pair slots, dof masks, limit rows) at build time; its
``forward``/``step`` methods are pure jnp functions of (qpos, qvel,
ctrl) designed to be jitted once and vmapped over thousands of envs.

Pipeline (mirroring the reference engine's stages inside ``sim.step``,
reference: src/deepmimic_env.py:362):
  kinematics -> com quantities -> collision -> velocities -> CRBA ->
  RNE bias -> passive + actuation -> smooth solve -> contact/limit
  constraint solve -> integrate (semi-implicit Euler with implicit
  joint damping, or RK4 for parity with ``integrator="RK4"``).
"""
from __future__ import annotations

import functools

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.models.physics_model import FREE, PhysicsModel, RK4
from deepmimic_mujoco_tpu.physics import dynamics
from deepmimic_mujoco_tpu.physics.collision import (
    Contacts, build_pair_tables, collide,
)
from deepmimic_mujoco_tpu.physics.kinematics import (
    Com, Kin, com_pos, com_vel, fwd_kinematics,
)
from deepmimic_mujoco_tpu.physics.solver import SolveResult, solve_constraints
from deepmimic_mujoco_tpu.utils import quat as jq


class EngineData(NamedTuple):
    """Everything an env layer reads after a forward pass (the fields
    the reference reads off MjData: xpos/xipos/geom_xpos/cvel/contact/
    qfrc_smooth/qfrc_constraint; src/deepmimic_env.py:33-137)."""
    kin: Kin
    com: Com
    cvel: jnp.ndarray            # (nbody, 6)
    contacts: Contacts
    qacc: jnp.ndarray            # (nv,)
    qfrc_smooth: jnp.ndarray     # (nv,)
    qfrc_constraint: jnp.ndarray  # (nv,)
    lam: jnp.ndarray             # (3*max_contacts + nlimit,) solver forces


def _hi_matmul(fn):
    """Trace ``fn`` under ``default_matmul_precision('highest')``.

    TPU MXU matmuls round their INPUTS to bf16 at default precision —
    measured up to 3.4e-2 abs error in com-stage quantities and bf16
    rounding of every one-hot contact gather vs the CPU path (round-5
    diagnosis, runs/q_r5_lanes_diag.log). Physics matmuls here are
    tiny (nv- and contact-sized), so exactness is free; the RL network
    matmuls are outside this scope and keep the fast default."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped


def _neutral_qpos(model: PhysicsModel) -> np.ndarray:
    q = np.zeros(model.nq)
    if model.njnt and model.jnt_type[0] == FREE:
        q[2] = 10.0  # high above the floor
        q[3] = 1.0
    return q


class Engine:
    def __init__(self, model: PhysicsModel, max_contacts: int = 24,
                 iterations: Optional[int] = None,
                 integrator: Optional[int] = None,
                 warm_start_lam: bool = True,
                 mesh_subcapsules: int = 2,
                 cone: str = "elliptic",
                 lanes_position: bool = True):
        self.m = model
        self.max_contacts = max_contacts
        self.iterations = iterations if iterations is not None \
            else model.opt.iterations
        self.integrator = integrator if integrator is not None \
            else model.opt.integrator
        self.dt = model.opt.timestep
        # mesh_subcapsules > 1 (default 2 since round 3): tighter
        # per-segment proxies for mesh-mesh self-collision (collapse
        # poses); the committed gate policies are trained against the
        # default — pass 1 to reproduce round-1/2 dynamics
        self.tables = build_pair_tables(model, mesh_subcapsules)
        if any(g.is_proxy.any() for g in self.tables):
            from deepmimic_mujoco_tpu.physics.collision import (
                calibrate_proxy_gaps,
            )

            calib = (model.key_qpos[0] if model.key_qpos is not None
                     else _neutral_qpos(model))
            self.tables = calibrate_proxy_gaps(model, self.tables, calib)
        self.body_dof = dynamics.body_dof_mask(model)
        self.limit_table = dynamics.limited_hinge_table(model)
        self.n_constraint_rows = (3 * self.max_contacts
                                  + len(self.limit_table[0]))
        # Warm-start forces are carried PAIR-KEYED, not slot-keyed:
        # top-K compaction orders contact slots by depth, so a slot's
        # identity churns whenever relative depths reorder (every
        # flight phase of a run gait) and slot-indexed forces would
        # warm-start the WRONG contact. The carry is the compact force
        # vector plus each slot's static pair-slot id; the next step
        # matches ids (a K x K one-hot, K <= max_contacts) so a
        # persisting contact keeps its force no matter how the
        # compaction reorders — the ordering-invariance MuJoCo gets
        # from warm-starting in joint space (qacc_warmstart), at
        # K*K cost instead of the full candidate-pair table (G1: 1252
        # candidate slots).
        from deepmimic_mujoco_tpu.physics.collision import total_slots

        self.n_pair_slots = total_slots(self.tables)
        k_slots = min(self.max_contacts, self.n_pair_slots)
        self.k_slots = k_slots
        self.n_warm_rows = 3 * k_slots + len(self.limit_table[0]) + k_slots
        # Warm-starting the constraint solve from the previous step's
        # forces measurably shifts the 50-iteration partial solution
        # (policies trained on cold starts drop from reward 339 to 27
        # on the walk gate). Default ON since round 3: the committed
        # gate policies are trained against it end-to-end; pass False
        # to reproduce round-1/2 cold-start dynamics.
        self.warm_start_lam = warm_start_lam
        # Friction-cone projection: "elliptic" (default; the smooth
        # cone) or "pyramidal" (tangent-aligned box — the mujoco200 PGS
        # cone the reference ran under, for parity quantification; see
        # docs/ARCHITECTURE.md "Cone approximation").
        self.cone = cone
        # Env-in-lanes FK/com under vmap (physics/lanes.py): same
        # formulas with the env axis in TPU lanes — the per-env layout
        # tiles (B, L, 3/4) intermediates to >95%-padding blocks and
        # cost 7.6 ms of the 21.1 ms G1 step at batch 4096 (round-4
        # stage profile). Single-env calls keep the original path.
        self.lanes_position = lanes_position
        if lanes_position:
            from deepmimic_mujoco_tpu.physics.lanes import make_position_fn

            self._pos_fn = make_position_fn(model)

    # ---- stages -------------------------------------------------------
    @_hi_matmul
    def position_stage(self, qpos):
        if self.lanes_position:
            kin, com = self._pos_fn(qpos)
        else:
            kin = fwd_kinematics(self.m, qpos)
            com = com_pos(self.m, kin)
        contacts = collide(self.m, self.tables, kin, self.max_contacts)
        return kin, com, contacts

    @_hi_matmul
    def forward(self, qpos, qvel, ctrl, h_implicit: float = 0.0,
                lam0=None) -> EngineData:
        """Full dynamics: qacc under current state + control.

        ``h_implicit > 0`` augments the mass matrix with ``h*diag(
        damping)`` (the engine's Euler-integrator implicit damping);
        the damping force itself is always applied explicitly.
        ``lam0`` warm-starts the constraint solve from the previous
        step's forces in PAIR-SLOT space (``n_warm_rows``; carried in
        env state); it is gathered onto this step's compacted slots via
        the collision selection matrix so a persisting contact keeps
        its force regardless of how top-K reorders the slots.
        """
        m = self.m
        kin, com, contacts = self.position_stage(qpos)
        if lam0 is not None:
            lam0 = self._gather_warm(contacts.slot_idx, lam0)
        cvel, cdof_dot = com_vel(m, com, qvel)

        M = dynamics.crb(m, com)
        bias = dynamics.rne(m, com, cvel, cdof_dot, qvel)
        damping = jnp.asarray(m.dof_damping, qvel.dtype)
        floss = jnp.asarray(m.dof_frictionloss, qvel.dtype)
        if h_implicit:
            # linearized implicit Coulomb: force magnitude is exactly
            # +-floss for |v| > eps and linear near zero, but enters the
            # velocity update implicitly -> unconditionally stable even
            # on near-massless finger dofs
            c_fric = floss / jnp.maximum(jnp.abs(qvel), 5e-3)
        else:
            # explicit path (RK4 parity): bound the slope so dt*c/I of
            # the smallest G1 dofs stays inside the RK4 stability region
            c_fric = jnp.zeros_like(floss)
        fric_force = (-c_fric * qvel if h_implicit
                      else -floss * jnp.tanh(qvel / 0.05))

        passive = (dynamics.passive_force(m, qpos, qvel)
                   - damping * qvel + fric_force)
        act = dynamics.actuator_force(m, ctrl)
        qfrc_smooth = passive + act - bias

        M_hat = (M + h_implicit * jnp.diag(damping + c_fric)
                 if h_implicit else M)

        res = solve_constraints(
            m, com, M_hat, qfrc_smooth, qpos, qvel, contacts,
            self.body_dof, self.limit_table, iterations=self.iterations,
            lam0=lam0, cone=self.cone)

        return EngineData(kin=kin, com=com, cvel=cvel, contacts=contacts,
                          qacc=res.qacc, qfrc_smooth=qfrc_smooth,
                          qfrc_constraint=res.qfrc_constraint,
                          lam=self._scatter_warm(contacts.slot_idx,
                                                 res.lam))

    # ---- pair-keyed warm start ------------------------------------------
    # Carried layout: [normal(K), t1(K), t2(K), limits(L),
    # slot_idx(K) as f32]; the solver's compact lam is
    # [normal(K), t1(K), t2(K), limits(L)] over this step's top-K
    # slots. Gathering = matching previous ids to current ids (exact
    # equivalence with a scatter/gather through the full pair-slot
    # table: ids are unique, and any pair absent from the previous
    # top-K carried zero force by construction).
    def _gather_warm(self, slot_idx, lam_packed):
        K = slot_idx.shape[0]
        nl = 3 * K + len(self.limit_table[0])
        lamp = lam_packed[:nl]
        idx_prev = lam_packed[nl:].astype(jnp.int32)
        match = (slot_idx[:, None] == idx_prev[None, :]).astype(
            lam_packed.dtype)                                  # (K, K)
        # HIGHEST precision: the default TPU matmul is bf16-reduced,
        # which would truncate the gathered warm-start forces relative
        # to the CPU path (a small CPU-vs-TPU dynamics divergence in an
        # engine that gates trained checkpoints on exact semantics)
        parts = [jnp.matmul(match, lamp[i * K:(i + 1) * K],
                            precision=jax.lax.Precision.HIGHEST)
                 for i in range(3)]
        return jnp.concatenate(parts + [lamp[3 * K:]])

    def _scatter_warm(self, slot_idx, lam):
        return jnp.concatenate([lam, slot_idx.astype(lam.dtype)])

    def empty_lam(self, dtype=jnp.float32):
        """Zero warm-start carry. The trailing slot-id segment is -1
        (no real pair-slot id is negative) so an 'empty' entry can
        never alias the valid pair-slot id 0 — with a zero-filled id
        segment, a current id-0 slot would match all K previous
        entries and correctness would rest on the implicit invariant
        that zero-id carries also hold zero force."""
        lam = jnp.zeros(self.n_warm_rows, dtype)
        return lam.at[self.n_warm_rows - self.k_slots:].set(-1.0)

    # ---- integration ---------------------------------------------------
    def integrate_pos(self, qpos, qvel, h):
        """qpos advance with proper quaternion integration (free joints
        use the local-frame angular velocity convention). Fast path for
        the common single-free-root + hinges layout (fully vectorized);
        generic per-joint fallback otherwise."""
        m = self.m
        single_free_root = (m.njnt > 0 and m.jnt_type[0] == FREE
                            and np.all(np.asarray(m.jnt_type[1:]) == 3))
        if single_free_root:
            quat = jq.integrate(qpos[3:7], qvel[3:6], h)
            return jnp.concatenate([
                qpos[0:3] + h * qvel[0:3], quat, qpos[7:] + h * qvel[6:]])
        new = qpos
        for j in range(m.njnt):
            qadr = int(m.jnt_qposadr[j])
            dadr = int(m.jnt_dofadr[j])
            if m.jnt_type[j] == FREE:
                new = new.at[qadr:qadr + 3].set(
                    qpos[qadr:qadr + 3] + h * qvel[dadr:dadr + 3])
                q = jq.integrate(qpos[qadr + 3:qadr + 7],
                                 qvel[dadr + 3:dadr + 6], h)
                new = new.at[qadr + 3:qadr + 7].set(q)
            else:  # hinge/slide: scalar
                new = new.at[qadr].set(qpos[qadr] + h * qvel[dadr])
        return new

    def step(self, qpos, qvel, ctrl, lam0=None):
        """One physics step at the model timestep. Returns
        (qpos', qvel', EngineData of the first forward evaluation).

        RK4 is expressed as a ``lax.scan`` over the 4 stages so the
        forward pipeline is traced ONCE (4x smaller XLA program than
        unrolling; the reference engine's RK4 likewise reuses one
        pipeline)."""
        h = self.dt
        if self.integrator == RK4:
            offs = jnp.asarray([0.0, h / 2, h / 2, h], qpos.dtype)

            def stage(carry, off):
                v_prev, a_prev = carry
                q_i = self.integrate_pos(qpos, v_prev, off)
                v_i = qvel + a_prev * off
                a_i = self.forward(q_i, v_i, ctrl).qacc
                return (v_i, a_i), (v_i, a_i)

            _, (vs, accs) = jax.lax.scan(
                stage, (qvel, jnp.zeros_like(qvel)), offs)
            w = jnp.asarray([1.0, 2.0, 2.0, 1.0], qpos.dtype)[:, None] / 6.0
            v_avg = (vs * w).sum(0)
            a_avg = (accs * w).sum(0)
            qpos_new = self.integrate_pos(qpos, v_avg, h)
            qvel_new = qvel + a_avg * h
            # pre-integration data view (position/velocity stages only;
            # keeps the traced graph to one extra FK, not a 5th forward)
            d = self.data_view(qpos, qvel)
            return qpos_new, qvel_new, d
        # semi-implicit Euler with implicit joint damping
        if not self.warm_start_lam:
            lam0 = None
        d = self.forward(qpos, qvel, ctrl, h_implicit=h, lam0=lam0)
        qvel_new = qvel + d.qacc * h
        qpos_new = self.integrate_pos(qpos, qvel_new, h)
        return qpos_new, qvel_new, d

    @_hi_matmul
    def data_view(self, qpos, qvel) -> EngineData:
        """Position+velocity stage fields only (no dynamics), mirroring
        what the reference exposes after ``set_state``+``forward``."""
        kin, com, contacts = self.position_stage(qpos)
        cvel, _ = com_vel(self.m, com, qvel)
        z = jnp.zeros(self.m.nv, qpos.dtype)
        return EngineData(kin=kin, com=com, cvel=cvel, contacts=contacts,
                          qacc=z, qfrc_smooth=z, qfrc_constraint=z,
                          lam=self.empty_lam(qpos.dtype))
