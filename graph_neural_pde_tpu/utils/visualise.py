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


def animate_image_diffusion(paths, im_height, im_width, im_chan=1,
                            grid_height=2, grid_width=3, labels=None,
                            interval=10, unnormalize=False, out_path=None):
    """FuncAnimation of the diffusion trajectory over a grid of images —
    the reference's print_image_path animation
    (/root/reference/src/post_analysis_image.py:58-95).

    paths: [B, frames, H*W*C] node-state snapshots (GNNImage
    forward_plot_path). ``unnormalize`` applies the CIFAR A/2+0.5 rescale.
    Returns the matplotlib FuncAnimation; with ``out_path`` also saves it
    (.gif via pillow — the in-image writer; .mp4 needs ffmpeg).
    """
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation

    paths = np.asarray(paths)
    n_img = min(grid_height * grid_width, paths.shape[0])
    frames = paths.shape[1]

    def img_of(i, f):
        a = paths[i, f].reshape(im_height, im_width, im_chan).squeeze()
        return a / 2 + 0.5 if unnormalize else a

    fig, axes = plt.subplots(grid_height, grid_width,
                             figsize=(2.2 * grid_width, 2.4 * grid_height))
    axes = np.atleast_1d(axes).ravel()
    ims = []
    for i in range(n_img):
        ax = axes[i]
        im = ax.imshow(img_of(i, 0), cmap="gray" if im_chan == 1 else None,
                       interpolation="none")
        title = (f"t=0 Ground Truth: {labels[i]}" if labels is not None
                 else "t=0")
        ax.set_title(title, fontsize=8)
        ax.axis("off")
        ims.append(im)
    for ax in axes[n_img:]:
        ax.axis("off")

    def update(f):
        for i in range(n_img):
            ims[i].set_data(img_of(i, f))
            title = (f"t={f} Ground Truth: {labels[i]}" if labels is not None
                     else f"t={f}")
            axes[i].set_title(title, fontsize=8)
        return ims

    anim = FuncAnimation(fig, update, frames=frames, interval=interval)
    if out_path:
        anim.save(out_path, writer="pillow")
    return anim


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
