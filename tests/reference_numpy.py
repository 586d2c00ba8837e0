"""Independent numpy edge-loop implementations of the seven layer update
equations, written directly from the papers'/reference's documented math
(gnns/*.py docstrings). Deliberately naive (python loops over edges) so a
bug in the vectorized TPU code cannot be mirrored here.

All take the framework's own init params so weights match exactly.
"""

import numpy as np


def _act(name):
    name = (name or "linear").lower()
    if name == "linear":
        return lambda x: x
    if name == "tanh":
        return np.tanh
    if name == "relu":
        return lambda x: np.maximum(x, 0.0)
    if name == "leaky_relu":
        return lambda x: np.where(x >= 0, x, 0.2 * x)
    if name == "elu":
        return lambda x: np.where(x >= 0, x, np.expm1(x))
    if name == "gelu":
        from scipy.special import erf

        return lambda x: x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))
    raise ValueError(name)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


SMALL = 1e-7


def _aggregate(messages, targets, num_nodes, kind):
    dim = messages.shape[1] if messages.ndim > 1 else 1
    out = np.zeros((num_nodes, dim), dtype=np.float64)
    if kind == "sum":
        for m, t in zip(messages, targets):
            out[t] += m
        return out
    if kind == "mean":
        cnt = np.zeros(num_nodes)
        for m, t in zip(messages, targets):
            out[t] += m
            cnt[t] += 1
        return out / np.maximum(cnt, 1.0)[:, None]
    if kind == "sqrt_n":
        cnt = np.zeros(num_nodes)
        for m, t in zip(messages, targets):
            out[t] += m
            cnt[t] += 1
        return out / np.sqrt(np.maximum(cnt, 1.0))[:, None]
    if kind == "max":
        out[:] = np.finfo(np.float32).min
        for m, t in zip(messages, targets):
            out[t] = np.maximum(out[t], m)
        return out
    raise ValueError(kind)


def _typed_messages_linear(h, W, adj_lists, concat_target=False):
    """Per-type Dense on source (or concat(source, target)) states."""
    msgs, tgts = [], []
    for l, adj in enumerate(adj_lists):
        for (u, v) in adj:
            x = np.concatenate([h[u], h[v]]) if concat_target else h[u]
            msgs.append(x @ np.asarray(W[l], np.float64))
            tgts.append(v)
    return np.array(msgs), np.array(tgts)


def rgcn(params, h, adj_lists, counts, activation="tanh", aggregation="sum",
         normalize=True, use_both=False, timesteps=1):
    act = _act(activation)
    W = np.asarray(params["W"], np.float64)
    h = np.asarray(h, np.float64)
    n = h.shape[0]
    for _ in range(timesteps):
        msgs, tgts = [], []
        for l, adj in enumerate(adj_lists):
            for (u, v) in adj:
                x = np.concatenate([h[u], h[v]]) if use_both else h[u]
                m = x @ W[l]
                if normalize:
                    m = m / (counts[l, v] + SMALL)
                msgs.append(m)
                tgts.append(v)
        h = act(_aggregate(np.array(msgs), np.array(tgts), n, aggregation))
    return h


def ggnn_gru(params, h, adj_lists, activation="tanh", aggregation="sum", timesteps=1):
    W = np.asarray(params["W"], np.float64)
    h = np.asarray(h, np.float64)
    n, d = h.shape
    act = _act(activation)
    K = np.asarray(params["cell"]["kernel"], np.float64)
    U = np.asarray(params["cell"]["recurrent_kernel"], np.float64)
    b = np.asarray(params["cell"]["bias"], np.float64)
    def hard_sigmoid(x):
        # TF 1.13 keras recurrent_activation default.
        return np.clip(0.2 * x + 0.5, 0.0, 1.0)

    for _ in range(timesteps):
        msgs, tgts = _typed_messages_linear(h, W, adj_lists)
        agg = _aggregate(msgs, tgts, n, aggregation)
        xw = agg @ K + b
        z = hard_sigmoid(xw[:, :d] + h @ U[:, :d])
        r = hard_sigmoid(xw[:, d : 2 * d] + h @ U[:, d : 2 * d])
        # reset_after=False: reset gate on the state BEFORE the matmul.
        hh = act(xw[:, 2 * d :] + (r * h) @ U[:, 2 * d :])
        h = z * h + (1 - z) * hh
    return h


def gnn_film(params, h, adj_lists, counts, activation="relu",
             aggregation="sum", normalize=False, timesteps=1):
    act = _act(activation)
    W = np.asarray(params["W"], np.float64)
    Wf = np.asarray(params["W_film"], np.float64)
    h = np.asarray(h, np.float64)
    n, d = h.shape
    for _ in range(timesteps):
        msgs, tgts = [], []
        for l, adj in enumerate(adj_lists):
            for (u, v) in adj:
                m = h[u] @ W[l]
                if normalize:
                    m = m / (counts[l, v] + SMALL)
                gb = h[v] @ Wf[l]
                m = gb[:d] * m + gb[d:]
                msgs.append(act(m))
                tgts.append(v)
        agg = _aggregate(np.array(msgs), np.array(tgts), n, aggregation)
        mean = agg.mean(-1, keepdims=True)
        var = ((agg - mean) ** 2).mean(-1, keepdims=True)
        h = (agg - mean) / np.sqrt(var + 1e-12) * np.asarray(
            params["ln"]["scale"], np.float64
        ) + np.asarray(params["ln"]["bias"], np.float64)
    return h


def rgat(params, h, adj_lists, num_heads, activation="tanh", timesteps=1):
    act = _act(activation)
    W = np.asarray(params["W"], np.float64)
    att = np.asarray(params["att"], np.float64)
    h = np.asarray(h, np.float64)
    n, d = h.shape
    dh = d // num_heads
    lrelu = _act("leaky_relu")
    for _ in range(timesteps):
        # per-edge logits and messages per head
        logits, msgs, tgts = [], [], []
        for l, adj in enumerate(adj_lists):
            t = h @ W[l]  # [n, d]
            a = att[l].reshape(num_heads, 2 * dh)
            for (u, v) in adj:
                src = t[u].reshape(num_heads, dh)
                tgt = t[v].reshape(num_heads, dh)
                cat = np.concatenate([src, tgt], axis=1)  # [K, 2dh]
                logits.append(lrelu((cat * a).sum(1)))
                msgs.append(src)
                tgts.append(v)
        logits = np.array(logits)  # [M, K]
        msgs = np.array(msgs)  # [M, K, dh]
        tgts = np.array(tgts)
        out = np.zeros((n, num_heads, dh))
        for k in range(num_heads):
            for v in range(n):
                sel = tgts == v
                if not sel.any():
                    continue
                lg = logits[sel, k]
                ex = np.exp(lg - lg.max())
                w = ex / (ex.sum() + SMALL)
                out[v, k] = (w[:, None] * msgs[sel, k]).sum(0)
        h = act(out.reshape(n, d))
    return h


def _mlp_typed(x, weights, l, inner_act):
    y = x @ np.asarray(weights[0][l], np.float64)
    for W in weights[1:]:
        y = inner_act(y) @ np.asarray(W[l], np.float64)
    return y


def rgin(params, h, adj_lists, activation="relu", aggregation="sum",
         use_target=False, edge_hidden=1, aggr_hidden=None, timesteps=1):
    act = _act(activation)
    h = np.asarray(h, np.float64)
    n = h.shape[0]
    for _ in range(timesteps):
        msgs, tgts = [], []
        for l, adj in enumerate(adj_lists):
            for (u, v) in adj:
                x = np.concatenate([h[u], h[v]]) if use_target else h[u]
                if edge_hidden is not None:
                    m = act(_mlp_typed(x, params["edge_mlp"], l, act))
                else:
                    m = x
                msgs.append(m)
                tgts.append(v)
        agg = _aggregate(np.array(msgs), np.array(tgts), n, aggregation)
        if aggr_hidden is not None:
            layers = params["aggr_mlp"]["layers"]
            y = agg
            for layer in layers[:-1]:
                y = act(y @ np.asarray(layer["kernel"], np.float64))
            agg = y @ np.asarray(layers[-1]["kernel"], np.float64)
        agg = act(agg)
        mean = agg.mean(-1, keepdims=True)
        var = ((agg - mean) ** 2).mean(-1, keepdims=True)
        h = (agg - mean) / np.sqrt(var + 1e-12) * np.asarray(
            params["ln"]["scale"], np.float64
        ) + np.asarray(params["ln"]["bias"], np.float64)
    return h


def gnn_edge_mlp(params, h, adj_lists, counts, activation="gelu",
                 aggregation="sum", normalize=False, use_target=True, timesteps=1):
    act = _act(activation)
    elu = _act("elu")
    h = np.asarray(h, np.float64)
    n = h.shape[0]
    for _ in range(timesteps):
        msgs, tgts = [], []
        for l, adj in enumerate(adj_lists):
            for (u, v) in adj:
                x = np.concatenate([h[u], h[v]]) if use_target else h[u]
                m = _mlp_typed(x, params["edge_mlp"], l, elu)
                if normalize:
                    m = m / (counts[l, v] + SMALL)
                msgs.append(act(m))
                tgts.append(v)
        agg = _aggregate(np.array(msgs), np.array(tgts), n, aggregation)
        mean = agg.mean(-1, keepdims=True)
        var = ((agg - mean) ** 2).mean(-1, keepdims=True)
        h = (agg - mean) / np.sqrt(var + 1e-12) * np.asarray(
            params["ln"]["scale"], np.float64
        ) + np.asarray(params["ln"]["bias"], np.float64)
    return h


def rgdcn(params, h, adj_lists, counts, num_channels, channel_dim,
          use_full_state=False, tie_channels=False, activation="relu",
          aggregation="sum", normalize=True, timesteps=1):
    act = _act(activation)
    W = np.asarray(params["W_wc"], np.float64)  # [L, C_eff, in, K*K]
    h = np.asarray(h, np.float64)
    n = h.shape[0]
    K = channel_dim
    for _ in range(timesteps):
        hc = h.reshape(n, num_channels, K)
        new_channels = []
        for c in range(num_channels):
            ce = 0 if tie_channels else c
            msgs, tgts = [], []
            for l, adj in enumerate(adj_lists):
                for (u, v) in adj:
                    wc_in = h[v] if use_full_state else hc[v, c]
                    kern = act(wc_in @ W[l, ce]).reshape(K, K)
                    m = hc[u, c] @ kern
                    if normalize:
                        m = m / (counts[l, v] + SMALL)
                    msgs.append(m)
                    tgts.append(v)
            agg = _aggregate(np.array(msgs), np.array(tgts), n, aggregation)
            new_channels.append(act(agg))
        h = np.concatenate(new_channels, axis=1)
    return h
