"""Generate numerical-parity fixtures from the reference solver stack.

Runs the PyTorch reference's vendored torchdiffeq (read-only, as an *oracle*) on
a set of problems and stores the trajectories as .npz under tests/fixtures/.
Only data is committed; tests compare ndcn_tpu solvers against these tables to
the ≤1e-4 relative-L1 target (BASELINE.md). RHS formulas below are written from
the published equations, with parameters matching the reference defaults.

Usage (once, in an environment where /root/reference exists):
    python tools/make_parity_fixtures.py
"""

import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


def main():
    sys.path.insert(0, REF)
    import torch
    import torchdiffeq as ode

    sys.path.insert(0, os.path.dirname(OUT.rsplit("/tests", 1)[0]) or ".")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    from ndcn_tpu.graph import generators, operators

    os.makedirs(OUT, exist_ok=True)
    torch.manual_seed(0)
    fixtures = {}

    # ---- 1. linear 2x2 system, tight dopri5 ---------------------------------
    a_mat = torch.tensor([[-0.3, 1.2], [-1.2, -0.3]])

    class Lin(torch.nn.Module):
        def forward(self, t, y):
            return y @ a_mat.T

    t = torch.linspace(0.0, 5.0, 50)
    y0 = torch.tensor([[1.0, -0.5]])
    sol = ode.odeint(Lin(), y0, t, rtol=1e-7, atol=1e-9, method="dopri5")
    fixtures["linear2d_dopri5"] = dict(t=t.numpy(), y0=y0.numpy(),
                                       a=a_mat.numpy(), sol=sol.numpy())

    # ---- 2. fixed-grid methods on exp decay ---------------------------------
    class Decay(torch.nn.Module):
        def forward(self, t, y):
            return -y

    t = torch.linspace(0.0, 2.0, 40)
    y0 = torch.arange(1.0, 7.0).reshape(2, 3)
    for method in ["euler", "midpoint", "rk4", "fixed_adams", "explicit_adams"]:
        # order-11 AB amplifies float32 roundoff exponentially on this grid;
        # cap the order so the comparison tests coefficients, not chaos.
        opts = {"max_order": 5} if method == "explicit_adams" else None
        sol = ode.odeint(Decay(), y0, t, method=method, options=opts)
        fixtures[f"decay_{method}"] = dict(t=t.numpy(), y0=y0.numpy(),
                                           sol=sol.numpy())

    # ---- 2b. adaptive-order VCABM on a linear system -------------------------
    t = torch.linspace(0.0, 4.0, 25)
    y0 = torch.tensor([[1.0, -0.5]])
    sol = ode.odeint(Lin(), y0, t, rtol=1e-6, atol=1e-8, method="adams")
    fixtures["linear2d_adams"] = dict(t=t.numpy(), y0=y0.numpy(),
                                      a=a_mat.numpy(), sol=sol.numpy())

    # ---- 3. heat diffusion on the 400-node grid (flagship physics) ----------
    adj = generators.build_network("grid", 400, seed=0)
    lap = operators.laplacian_dense(adj)  # D - A
    lap_t = torch.asarray(lap)

    class Heat(torch.nn.Module):
        def forward(self, t, x):
            return -(lap_t @ x)

    x0 = torch.asarray(generators.grid_block_initial_value(20).astype(np.float32))
    t = torch.linspace(0.0, 5.0, 100)
    sol = ode.odeint(Heat(), x0, t, rtol=1e-7, atol=1e-9, method="dopri5")
    fixtures["heat_grid400_dopri5"] = dict(t=t.numpy(), x0=x0.numpy(),
                                           sol=sol.numpy())

    # ---- 4. gene + mutualistic (d=1) on a small random graph ----------------
    adj_small = generators.build_network("random", 60, seed=1)
    a_t = torch.asarray(adj_small)

    class Gene(torch.nn.Module):
        # dx/dt = -b x^f + A (x^h / (1 + x^h)); defaults b=1, f=1, h=2
        def forward(self, t, x):
            return -x + a_t @ (x ** 2 / (x ** 2 + 1))

    class Mutual(torch.nn.Module):
        # dx_i/dt = b + x(1-x/k)(x/c-1) + sum_j A_ij x_i x_j/(d + e x_i + h x_j)
        def forward(self, t, x):
            b, k, c, d5, e, h = 0.1, 5.0, 1.0, 5.0, 0.9, 0.1
            n = x.shape[0]
            f = b + x * (1 - x / k) * (x / c - 1)
            outer = a_t @ ((x @ x.T) / (d5 + (e * x).repeat(1, n)
                                        + (h * x.T).repeat(n, 1)))
            return f + torch.diag(outer).view(-1, 1)

    x0s = torch.asarray(generators.grid_block_initial_value(8)[:60].astype(np.float32))
    t = torch.linspace(0.0, 5.0, 60)
    for name, mod in [("gene", Gene()), ("mutualistic", Mutual())]:
        sol = ode.odeint(mod, x0s, t, rtol=1e-7, atol=1e-9, method="dopri5")
        fixtures[f"{name}_random60_dopri5"] = dict(
            t=t.numpy(), x0=x0s.numpy(), adj=adj_small, sol=sol.numpy())

    # ---- 5. full NDCN forward with shared weights ----------------------------
    om = operators.normalized_laplacian(adj)
    om_t = torch.asarray(om)
    hid = 20
    lin = torch.nn.Linear
    enc1, enc2 = lin(1, hid), lin(hid, hid)
    wt, dec = lin(hid, hid), lin(hid, 1)

    class OdeF(torch.nn.Module):
        def forward(self, t, h):
            return torch.relu(wt(om_t @ h))

    t = torch.linspace(0.0, 5.0, 30)
    with torch.no_grad():
        h0 = enc2(torch.tanh(enc1(x0)))
        traj = ode.odeint(OdeF(), h0, t, rtol=0.01, atol=0.001, method="dopri5")
        out = dec(traj)
    fixtures["ndcn_forward_grid400"] = dict(
        t=t.numpy(), x0=x0.numpy(), out=out.numpy(),
        enc1_w=enc1.weight.detach().numpy(), enc1_b=enc1.bias.detach().numpy(),
        enc2_w=enc2.weight.detach().numpy(), enc2_b=enc2.bias.detach().numpy(),
        wt_w=wt.weight.detach().numpy(), wt_b=wt.bias.detach().numpy(),
        dec_w=dec.weight.detach().numpy(), dec_b=dec.bias.detach().numpy())

    for name, data in fixtures.items():
        np.savez_compressed(os.path.join(OUT, name + ".npz"), **data)
        print("wrote", name, {k: np.asarray(v).shape for k, v in data.items()})


if __name__ == "__main__":
    main()
