"""Lotka-Volterra neural-ODE demo (reference: LV_model.py).

Ground truth: the 2-species LV system dx/dt = 2/3·x - 4/3·x·y, dy/dt = x·y - y
(the reference encodes it as diag([x, xy; xy, y] @ Aᵀ) with A = [[2/3,-4/3],[1,-1]],
LV_model.py:37-66). A 2→20→2 tanh MLP is trained as the ODE RHS on random
minibatches of trajectory windows (get_batch, LV_model.py:80-89) with L1 loss and
Adam(lr=1e-2, wd=1e-3) through an rk4 solve.

TPU-first: batch windows integrate as one vmapped state (B, 2); the train step is
jitted end-to-end.

Usage: python -m ndcn_tpu.experiments.lv --niters 400 --platform cpu
"""

from __future__ import annotations

import argparse
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("ODE demo")
    p.add_argument("--method", type=str, choices=["dopri5", "adams", "rk4", "euler"],
                   default="rk4")
    p.add_argument("--data_size", type=int, default=1000)
    p.add_argument("--batch_time", type=int, default=25)
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--niters", type=int, default=2000)
    p.add_argument("--test_freq", type=int, default=20)
    p.add_argument("--viz", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--adjoint", action="store_true")
    from ndcn_tpu.utils.platform import add_platform_flag
    add_platform_flag(p)
    return p


def run(args: argparse.Namespace):
    from ndcn_tpu.utils.platform import force_platform, set_matmul_precision
    force_platform(args.platform)
    set_matmul_precision(args.precision)
    from ndcn_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ndcn_tpu.models import nn
    from ndcn_tpu.ode import odeint, odeint_with_stats
    from ndcn_tpu.ode.adjoint import odeint_adjoint
    from ndcn_tpu.train.losses import l1_loss
    from ndcn_tpu.train.optim import torch_adam
    from ndcn_tpu.train.sampling import sample_trajectory_windows

    t_start = time.time()
    true_y0 = jnp.asarray([[0.9, 1.8]], jnp.float32)
    t = jnp.linspace(-5.0, 5.0, args.data_size)

    def lv_rhs(tt, y):
        x, z = y[..., 0], y[..., 1]
        return jnp.stack([2.0 / 3.0 * x - 4.0 / 3.0 * x * z, x * z - z], axis=-1)

    true_y, gt_stats = odeint_with_stats(lv_rhs, true_y0, t, rtol=1e-7, atol=1e-9,
                                         method="dopri5",
                                         options={"differentiable": False})
    print(tuple(true_y.shape), "ground truth,", int(gt_stats.nfe), "RHS evals")

    # MLP ODE function: 2 → 20 → 2 with tanh
    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    params = {"l1": nn.linear_init(k1, 2, 20), "l2": nn.linear_init(k2, 20, 2)}

    def func(p, tt, y):
        return nn.linear_apply(p["l2"], jnp.tanh(nn.linear_apply(p["l1"], y)))

    opt = torch_adam(1e-2, 1e-3)
    opt_state = opt.init(params)
    batch_t = t[: args.batch_time] - t[0]  # window times, shifted to start at 0

    rng = np.random.RandomState(args.seed)

    traj_host = np.asarray(true_y[:, 0])  # (data_size, 2) on host for sampling

    def get_batch():
        """Random trajectory windows (LV_model.py:80-89)."""
        y0, window = sample_trajectory_windows(rng, traj_host, args.batch_time,
                                               args.batch_size)
        return jnp.asarray(y0), jnp.asarray(window)

    @jax.jit
    def train_step(p, s_opt, batch_y0, batch_y):
        def loss_fn(q):
            if args.adjoint:
                pred = odeint_adjoint(func, batch_y0, batch_t, q, rtol=1e-7,
                                      atol=1e-9, method=args.method)
            else:
                pred = odeint(lambda tt, y: func(q, tt, y), batch_y0, batch_t,
                              method=args.method)
            return l1_loss(pred, batch_y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s_opt = opt.update(grads, s_opt, p)
        return jax.tree_util.tree_map(lambda a, u: a + u, p, updates), s_opt, loss

    @jax.jit
    def full_eval(p):
        pred = odeint(lambda tt, y: func(p, tt, y), true_y0, t - t[0],
                      rtol=1e-5, atol=1e-7, method="dopri5")
        return jnp.mean(jnp.abs(pred - true_y)), pred

    final_loss = None
    for itr in range(1, args.niters + 1):
        by0, by = get_batch()
        params, opt_state, loss = train_step(params, opt_state, by0, by)
        if itr % args.test_freq == 0:
            total, _ = full_eval(params)
            final_loss = float(total)
            print("Iter {:04d} | Total Loss {:.6f}".format(itr, final_loss))

    if args.viz:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            import os

            _, pred = full_eval(params)
            os.makedirs("figure/lv", exist_ok=True)
            fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
            ty = np.asarray(true_y)[:, 0]
            py = np.asarray(pred)[:, 0]
            ax1.plot(ty[:, 0], ty[:, 1], "g-", label="true")
            ax1.plot(py[:, 0], py[:, 1], "b--", label="learned")
            ax1.set_title("phase portrait")
            ax1.legend()
            tn = np.asarray(t)
            ax2.plot(tn, ty[:, 0], "g-", tn, ty[:, 1], "g-")
            ax2.plot(tn, py[:, 0], "b--", tn, py[:, 1], "b--")
            ax2.set_title("trajectories")
            fig.savefig("figure/lv/phase_portrait.png", transparent=True)
            plt.close(fig)
            print("wrote figure/lv/phase_portrait.png")
        except Exception as e:
            print(f"[viz] skipped: {e}")

    print("Total Time {:.4f}".format(time.time() - t_start))
    return {"final_loss": final_loss, "params": params}


def main(argv=None):
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
