#!/usr/bin/env python3
"""Prophet-prior MAP anchor (pure numpy — no scipy, no cmdstan).

The golden frames pin StructuralTS against golden_gen.py: two
INDEPENDENT implementations of the repo's documented model (ridge MAP).
What that cannot pin is the distance to the model the reference
actually runs — Prophet's own MAP estimate, whose priors differ by
design (documented in StructuralTS.scala): Laplace(0, tau) on the
changepoint deltas instead of ridge, Normal(0, 5) on (k, m) instead of
~flat, and a jointly-estimated observation sigma weighting the
likelihood instead of the unit-sigma normal equations. Prophet itself
cannot run in this container (cmdstan binary, scipy); THIS script
removes the remaining blocker by implementing exactly that objective —
the log posterior of Prophet's linear-growth Stan model — and
maximizing it with a self-contained L-BFGS (two-loop recursion +
Armijo backtracking), on the reference's own fixture series.

Objective (y absmax-scaled to z, t scaled to [0, 1] — Prophet's
scaling, shared by golden_gen.fit):

  -log p  =  n*log(sigma) + SSR/(2 sigma^2)          # z ~ N(X beta, sigma)
           + (k^2 + m^2)/(2*5^2)                      # k, m ~ N(0, 5)
           + sum |delta_i| / tau                      # delta ~ Laplace(0, tau)
           + sum beta_seas^2/(2*10^2)                 # seasonality ~ N(0, 10)
           + beta_x^2/(2*10^2)                        # regressor ~ N(0, 10)
           + sigma^2/(2*0.5^2)                        # sigma ~ N+(0, 0.5)

optimized over (beta, log sigma); |.| is smoothed as sqrt(d^2 + 1e-10)
(cmdstan's L-BFGS treats the kink the same way in effect: subgradient
steps through it). Design matrix, changepoint grid, and seasonality
switches are golden_gen's — identical regressors, so any output gap is
PRIOR/WEIGHTING distance, not feature distance.

Output: per fixture/correlation/side, the max relative deviation of
yhat (vs the series' absmax) between the repo's ridge MAP and the
Prophet-prior MAP, split into history and future rows. The measured
band is recorded in GoldenParitySpec's Scaladoc — run this script to
regenerate it.

Run:  python3 tools/prophet_map.py
"""
import json
import math

import numpy as np

import golden_gen as gg

TAU_DEFAULT = 0.05  # Prophet's changepoint_prior_scale default
ABS_EPS = 1e-10


def neg_log_post(theta, X, z, n_cp, tau):
    beta, u = theta[:-1], theta[-1]
    sigma = math.exp(u)
    r = z - X @ beta
    ssr = float(r @ r)
    deltas = beta[2:2 + n_cp]
    f = (len(z) * u + ssr / (2 * sigma * sigma)
         + (beta[0] ** 2 + beta[1] ** 2) / (2 * 25.0)
         + float(np.sqrt(deltas ** 2 + ABS_EPS).sum()) / tau
         + float((beta[2 + n_cp:] ** 2).sum()) / (2 * 100.0)
         + sigma * sigma / (2 * 0.25))
    g_beta = -(X.T @ r) / (sigma * sigma)
    g_beta[0] += beta[0] / 25.0
    g_beta[1] += beta[1] / 25.0
    g_beta[2:2 + n_cp] += deltas / (np.sqrt(deltas ** 2 + ABS_EPS) * tau)
    g_beta[2 + n_cp:] += beta[2 + n_cp:] / 100.0
    g_u = len(z) - ssr / (sigma * sigma) + sigma * sigma / 0.25
    return f, np.append(g_beta, g_u)


def lbfgs(f_g, x0, max_iter=5000, mem=10, tol=1e-14):
    """Minimal L-BFGS: two-loop recursion + Armijo backtracking."""
    x = x0.copy()
    f, g = f_g(x)
    s_hist, y_hist = [], []
    for _ in range(max_iter):
        q = g.copy()
        alpha = []
        for s, y in reversed(list(zip(s_hist, y_hist))):
            a = float(s @ q) / float(y @ s)
            alpha.append(a)
            q -= a * y
        if y_hist:
            q *= float(s_hist[-1] @ y_hist[-1]) / float(y_hist[-1] @ y_hist[-1])
        for (s, y), a in zip(zip(s_hist, y_hist), reversed(alpha)):
            b = float(y @ q) / float(y @ s)
            q += (a - b) * s
        d = -q
        gd = float(g @ d)
        if gd > 0:  # not a descent direction — restart from steepest
            d, gd = -g, -float(g @ g)
        step = 1.0
        for _ in range(40):
            f_new, g_new = f_g(x + step * d)
            if f_new <= f + 1e-4 * step * gd:
                break
            step *= 0.5
        else:
            break
        x_new = x + step * d
        s_vec, y_vec = x_new - x, g_new - g
        if float(s_vec @ y_vec) > 1e-12:
            s_hist.append(s_vec)
            y_hist.append(y_vec)
            if len(s_hist) > mem:
                s_hist.pop(0)
                y_hist.pop(0)
        done = abs(f - f_new) <= tol * max(1.0, abs(f))
        x, f, g = x_new, f_new, g_new
        if done or float(np.abs(g).max()) < 1e-8:
            break
    return x


def fit_prophet_map(t, y, x=None, tau=TAU_DEFAULT):
    """golden_gen.fit's design + Prophet's priors/likelihood by L-BFGS."""
    m0 = gg.fit(t, y, x)  # ridge solve = warm start; reuses cps/flags
    xs = ((x - m0["x_mean"]) / m0["x_sd"]) if x is not None else None
    X = gg.design(t, m0["t0"], m0["t_scale"], m0["cps"], m0["weekly"],
                  m0["yearly"], m0["daily"], xs)
    z = y / m0["y_scale"]
    theta0 = np.append(m0["beta"], math.log(max(m0["sigma_obs"], 1e-6)))
    theta = lbfgs(lambda th: neg_log_post(th, X, z, len(m0["cps"]), tau), theta0)
    m = dict(m0)
    m["beta"] = theta[:-1]
    m["sigma_obs"] = math.exp(theta[-1])
    return m


def yhat_of(m, t, x=None):
    return gg.predict(m, t, x)[0]


def compare(fix_name, documents, correlations):
    rows = []
    for c in correlations:
        cp = float(c.get("ChangePointPriorScale", 0.8))
        cov_t, cov_y = gg.extract_series(documents[c["fromData"]]["data"],
                                         c["fromIndex"], "D",
                                         c.get("dataAggregationType", "sum"))
        tgt_t, tgt_y = gg.extract_series(documents[c["toData"]]["data"],
                                         c["toIndex"], "D",
                                         c.get("dataAggregationType", "sum"))
        for side, (t, y) in (("cov", (cov_t, cov_y)), ("tgt", (tgt_t, tgt_y))):
            h = len(t)
            fut = t[-1] + gg.DAY * np.arange(1, h + 1)
            grid = np.concatenate([t, fut])
            ridge = yhat_of(gg.fit(t, y, cp_prior=cp), grid)
            # the reference passes the request's ChangePointPriorScale to
            # Prophet as tau; fall back to Prophet's 0.05 default shape
            prophet = yhat_of(fit_prophet_map(t, y, tau=cp), grid)
            scale = float(np.abs(y).max()) or 1.0
            rel = np.abs(ridge - prophet) / scale
            rows.append((fix_name, c["id"], side,
                         float(rel[:h].max()), float(rel[h:].max())))
    return rows


def main():
    all_rows = []
    ex = json.load(open("/root/reference/example-timestamp.json"))
    all_rows += compare("example_timestamp", ex["documents"],
                        ex["analyticsOptions"]["correlations"])
    el = json.load(open("/root/reference/electricity_demand.json"))
    docs = {k: v for k, v in el.items() if k != "analyticsOptions"}
    all_rows += compare("electricity_demand", docs,
                        el["analyticsOptions"]["correlations"])
    print(f"{'fixture':20s} {'corr':28s} side  max|d_yhat|/scale hist  future")
    for fix, cid, side, dh, df in all_rows:
        print(f"{fix:20s} {cid:28s} {side}   {dh:22.4f}  {df:.4f}")
    print("\nhist max: %.4f   future max: %.4f" %
          (max(r[3] for r in all_rows), max(r[4] for r in all_rows)))


if __name__ == "__main__":
    main()
