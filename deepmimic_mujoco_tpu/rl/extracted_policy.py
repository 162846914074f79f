"""Deployment artifact: a dependency-free NumPy MLP policy.

The reference ships a hand-inlined 66->256->128->28 tanh MLP with a
golden-vector self-test for torch-free deployment (reference:
src/extracted_policy.py:6-485). Here extraction is a function of any
trained checkpoint: weights are exported to an .npz plus a JSON golden
vector, and ``ExtractedPolicy`` runs inference with numpy only.
"""
from __future__ import annotations

import json
import os

import numpy as np


class ExtractedPolicy:
    """Numpy-only deterministic actor: obs -> mean action."""

    def __init__(self, weights_path: str):
        data = np.load(weights_path)
        self.layers = []
        i = 0
        while f"w{i}" in data:
            self.layers.append((data[f"w{i}"], data[f"b{i}"]))
            i += 1
        self.pd = None
        if "pd_kp" in data:
            self.pd = (data["pd_kp"], data["pd_kd"],
                       data["pd_qvel_cols"].astype(int),
                       float(data["pd_vel_obs_scale"]),
                       float(data["pd_act_scale"]))
        golden_path = weights_path.replace(".npz", "_golden.json")
        self.golden = None
        if os.path.exists(golden_path):
            with open(golden_path) as f:
                self.golden = json.load(f)

    def act(self, obs):
        obs = np.asarray(obs, np.float64)
        x = obs
        for i, (w, b) in enumerate(self.layers):
            x = x @ w + b
            if i < len(self.layers) - 1:
                x = np.tanh(x)
        if self.pd is not None:
            # PD-delta policies (networks.PDTargetActorCritic): the
            # network output is a joint delta; the env action is
            # (kp*delta - kd*qvel)/act_scale with qvel read from obs
            kp, kd, cols, vscale, ascale = self.pd
            x = (kp * x - kd * obs[..., cols] / vscale) / ascale
        return x

    def test(self):
        """Golden-vector self-test (reference: src/extracted_policy.py:480-485)."""
        assert self.golden is not None, "no golden vector saved"
        obs = np.asarray(self.golden["obs"])
        want = np.asarray(self.golden["action"])
        got = self.act(obs)
        assert np.allclose(got, want, atol=1e-5), (got, want)
        return True


def extract_policy(params, obs_example, out_path: str,
                   net=None) -> str:
    """Export the actor trunk of an ActorCritic params tree to .npz +
    golden vector JSON. Returns the .npz path.

    ``net``: pass the PDTargetActorCritic the checkpoint was trained
    with to bake its PD transform into the artifact; default exports a
    plain torque policy."""
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.rl.networks import ActorCritic, env_action

    # actor layers are Dense_0..Dense_k in declaration order: trunk + head
    p = params["params"]
    names = sorted([k for k in p if k.startswith("Dense_")],
                   key=lambda s: int(s.split("_")[1]))
    # first half = actor trunk+head (value trunk follows; see networks)
    n_actor = len(names) // 2
    arrs = {}
    for i, name in enumerate(names[:n_actor]):
        arrs[f"w{i}"] = np.asarray(p[name]["kernel"], np.float64)
        arrs[f"b{i}"] = np.asarray(p[name]["bias"], np.float64)
    if net is not None and hasattr(net, "env_action"):
        arrs["pd_kp"] = np.asarray(net.kp, np.float64)
        arrs["pd_kd"] = np.asarray(net.kd, np.float64)
        arrs["pd_qvel_cols"] = np.asarray(net.qvel_cols, np.int64)
        arrs["pd_vel_obs_scale"] = np.float64(net.vel_obs_scale)
        arrs["pd_act_scale"] = np.float64(net.act_scale)
    out_path = os.path.expanduser(out_path)
    if not out_path.endswith(".npz"):
        out_path += ".npz"
    np.savez(out_path, **arrs)

    # golden vector via the numpy path vs the flax path
    pol = ExtractedPolicy(out_path)
    obs = np.asarray(obs_example, np.float64)
    action = pol.act(obs)
    if net is None:
        net = ActorCritic(
            action_dim=action.shape[-1],
            net_arch=tuple(a.shape[0] for a in
                           [arrs[f"b{i}"] for i in range(n_actor - 1)]))
    o32 = jnp.asarray(obs, jnp.float32)
    mean, _, _ = net.apply(params, o32)
    mean = env_action(net, o32, mean)
    assert np.allclose(np.asarray(mean), action, atol=1e-4), \
        "extracted policy disagrees with flax forward"
    with open(out_path.replace(".npz", "_golden.json"), "w") as f:
        json.dump({"obs": obs.tolist(), "action": action.tolist(),
                   "source_checkpoint": out_path}, f)
    return out_path
