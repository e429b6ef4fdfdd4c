"""Analysis / visualisation utilities (layer L7 of the reference).

Equivalents of /root/reference/src/visualise_attention.py and
post_analysis_image.py: attention-graph drawing, diffusion-trajectory image
grids, attention heatmaps. matplotlib/networkx are imported lazily so the
core framework has no plotting dependency.
"""

from __future__ import annotations

import numpy as np


def attention_graph(g, attention, *, head: int | None = None):
    """networkx DiGraph weighted by (head-mean) attention
    (construct_graph, visualise_attention.py:12-44)."""
    import networkx as nx
    att = np.asarray(attention)
    if att.ndim == 2:
        att = att[:, head] if head is not None else att.mean(axis=1)
    mask = np.asarray(g.mask)
    gr = nx.DiGraph()
    gr.add_nodes_from(range(g.num_nodes))
    rows = np.asarray(g.row)[mask]
    cols = np.asarray(g.col)[mask]
    for r, c, w in zip(rows, cols, att[mask]):
        gr.add_edge(int(r), int(c), weight=float(w))
    return gr


def draw_attention_graph(g, attention, ax=None, layout_seed=0):
    import matplotlib.pyplot as plt
    import networkx as nx
    gr = attention_graph(g, attention)
    if ax is None:
        _, ax = plt.subplots(figsize=(8, 8))
    pos = nx.spring_layout(gr, seed=layout_seed)
    weights = [gr[u][v]["weight"] for u, v in gr.edges()]
    nx.draw(gr, pos, ax=ax, node_size=30,
            width=[3.0 * w for w in weights], arrows=False)
    return ax


def plot_image_trajectory(paths, im_height, im_width, im_chan=1,
                          image_idx=0, out_path=None):
    """Grid of diffusion snapshots for one image (print_image_path,
    post_analysis_image.py:20-54). paths: [B, frames, H*W*C]."""
    import matplotlib.pyplot as plt
    frames = paths.shape[1]
    fig, axes = plt.subplots(1, frames, figsize=(2.2 * frames, 2.4))
    if frames == 1:
        axes = [axes]
    for f, ax in enumerate(axes):
        img = np.asarray(paths[image_idx, f]).reshape(im_height, im_width,
                                                      im_chan)
        ax.imshow(img.squeeze(), cmap="gray")
        ax.set_title(f"t={f}")
        ax.axis("off")
    if out_path:
        fig.savefig(out_path, bbox_inches="tight")
    return fig


def attention_heatmap(g, attention, max_nodes=64, ax=None):
    """Dense [n, n] heatmap of head-mean attention (plot_att_heat,
    post_analysis_image.py)."""
    import matplotlib.pyplot as plt
    att = np.asarray(attention)
    if att.ndim == 2:
        att = att.mean(axis=1)
    n = min(g.num_nodes, max_nodes)
    dense = np.zeros((n, n))
    mask = np.asarray(g.mask)
    rows = np.asarray(g.row)[mask]
    cols = np.asarray(g.col)[mask]
    keep = (rows < n) & (cols < n)
    dense[rows[keep], cols[keep]] = att[mask][keep]
    if ax is None:
        _, ax = plt.subplots()
    im = ax.imshow(dense, cmap="viridis")
    ax.figure.colorbar(im, ax=ax)
    return ax
