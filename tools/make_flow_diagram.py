"""Generate the pipeline flow diagram SVG from the DAG spec.

The reference ships a hand-drawn workflow diagram
(reference docs/flow_diagram/flow_diagram.py -> workflow_diagram.svg);
here the diagram is GENERATED from the live
``pipeline/pipeline_dependency_graph.yaml`` so it can never go stale:
re-run this tool whenever the DAG changes.

Usage:  python tools/make_flow_diagram.py [out.svg]
        (default out: docs/img/workflow_diagram.svg)
"""

import pathlib
import sys

import yaml

# categorical colors by task nature (reference-palette slots 1-3,
# all-pairs validated on a light surface, + a recessive neutral for
# the trivial single steps); identity is never color-alone: every
# node is direct-labeled and the legend names each nature
NATURE_STYLE = {
    "independent": ("#f0efec", "#52514e", "single step"),
    "independent_each_frame": ("#2a78d6", "#ffffff", "parallel per frame"),
    "all_frames_at_once": ("#eb6834", "#ffffff", "global, all frames"),
    "all_missing_frames_at_once": ("#1baf7a", "#ffffff",
                                   "global, pending frames"),
}

NODE_W, NODE_H, GAP_X, GAP_Y = 300, 46, 28, 36
MARGIN_X, MARGIN_Y = 24, 24
LEGEND_H = 54


def layer_tasks(tasks):
    """Longest-path layering: layer = 1 + max(dep layers)."""
    layer = {}
    by_name = {t["name"]: t for t in tasks}

    def get(name):
        if name not in layer:
            deps = by_name[name]["dependencies"]
            layer[name] = 1 + max((get(d) for d in deps), default=-1)
        return layer[name]

    for t in tasks:
        get(t["name"])
    return layer


def main(out_path):
    spec = pathlib.Path(__file__).parents[1] / "lightcurver_tpu" / \
        "pipeline" / "pipeline_dependency_graph.yaml"
    tasks = yaml.safe_load(spec.read_text())["tasks"]
    layers = layer_tasks(tasks)
    n_layers = max(layers.values()) + 1
    rows = [[] for _ in range(n_layers)]
    for t in tasks:
        rows[layers[t["name"]]].append(t)
    n_cols = max(len(r) for r in rows)

    # edges spanning > 1 layer route through right-gutter lanes so
    # they never cross intermediate nodes
    skip_edges = [(d, t["name"]) for t in tasks
                  for d in t["dependencies"]
                  if layers[t["name"]] - layers[d] > 1]
    gutter = 24 * len(skip_edges) + (16 if skip_edges else 0)

    legend_w = MARGIN_X + sum(
        24 + round(7.2 * len(label)) + 26
        for _, _, label in NATURE_STYLE.values())
    width = max(MARGIN_X * 2 + n_cols * NODE_W + (n_cols - 1) * GAP_X
                + gutter, legend_w)
    height = (MARGIN_Y * 2 + LEGEND_H
              + n_layers * NODE_H + (n_layers - 1) * GAP_Y)

    grid_w = width - gutter  # nodes center in the non-gutter area
    pos = {}  # name -> (cx, cy)
    for li, row in enumerate(rows):
        row_w = len(row) * NODE_W + (len(row) - 1) * GAP_X
        x0 = (grid_w - row_w) / 2
        y = MARGIN_Y + LEGEND_H + li * (NODE_H + GAP_Y)
        for ci, t in enumerate(row):
            pos[t["name"]] = (x0 + ci * (NODE_W + GAP_X) + NODE_W / 2,
                              y + NODE_H / 2)

    e = []  # svg elements
    e.append(f'<rect width="{width}" height="{height}" fill="#fcfcfb"/>')

    # edges first (under the nodes): cubic curves bottom-of-dep ->
    # top-of-task, with an arrowhead marker
    e.append('<defs><marker id="arr" viewBox="0 0 8 8" refX="7" refY="4" '
             'markerWidth="7" markerHeight="7" orient="auto-start-reverse">'
             '<path d="M0 0.8 L7.2 4 L0 7.2 z" fill="#9a9892"/>'
             '</marker></defs>')
    for t in tasks:
        x1, y1 = pos[t["name"]]
        for d in t["dependencies"]:
            x0, y0 = pos[d]
            ya, yb = y0 + NODE_H / 2, y1 - NODE_H / 2
            if (d, t["name"]) in skip_edges:
                # right-gutter lane: out of the dep's side, down, into
                # the target's side — never through intermediate nodes
                lane = (width - MARGIN_X / 2
                        - 24 * skip_edges.index((d, t["name"])))
                xs, xe = x0 + NODE_W / 2, x1 + NODE_W / 2
                e.append(f'<path d="M{xs:.0f} {y0:.0f} '
                         f'C{lane:.0f} {y0:.0f} {lane:.0f} {y0:.0f} '
                         f'{lane:.0f} {y0 + NODE_H:.0f} '
                         f'L{lane:.0f} {y1 - NODE_H:.0f} '
                         f'C{lane:.0f} {y1:.0f} {lane:.0f} {y1:.0f} '
                         f'{xe + 4:.0f} {y1:.0f}" '
                         'fill="none" stroke="#9a9892" stroke-width="2" '
                         'marker-end="url(#arr)"/>')
                continue
            my = (ya + yb) / 2
            e.append(f'<path d="M{x0:.0f} {ya:.0f} C{x0:.0f} {my:.0f} '
                     f'{x1:.0f} {my:.0f} {x1:.0f} {yb - 3:.0f}" '
                     'fill="none" stroke="#9a9892" stroke-width="2" '
                     'marker-end="url(#arr)"/>')

    for t in tasks:
        cx, cy = pos[t["name"]]
        fill, ink, _ = NATURE_STYLE[t["nature"]]
        x, y = cx - NODE_W / 2, cy - NODE_H / 2
        e.append(f'<rect x="{x:.0f}" y="{y:.0f}" width="{NODE_W}" '
                 f'height="{NODE_H}" rx="8" fill="{fill}"/>')
        e.append(f'<text x="{cx:.0f}" y="{cy + 5:.0f}" fill="{ink}" '
                 'text-anchor="middle" font-size="15" '
                 f'font-family="system-ui, sans-serif">{t["name"]}</text>')

    # legend row (top): nature swatch + label
    lx = MARGIN_X
    for nature, (fill, _, label) in NATURE_STYLE.items():
        e.append(f'<rect x="{lx}" y="{MARGIN_Y}" width="16" height="16" '
                 f'rx="4" fill="{fill}" stroke="#d8d6d0"/>')
        e.append(f'<text x="{lx + 22}" y="{MARGIN_Y + 13}" fill="#52514e" '
                 'font-size="13" font-family="system-ui, sans-serif">'
                 f'{label}</text>')
        lx += 24 + round(7.2 * len(label)) + 26

    svg = (f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
           f'height="{height}" viewBox="0 0 {width} {height}" '
           'role="img" aria-label="lightcurver_tpu pipeline task graph">'
           + "".join(e) + "</svg>")
    out = pathlib.Path(out_path)
    out.write_text(svg)
    print(f"wrote {out} ({n_layers} layers, {len(tasks)} tasks)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         pathlib.Path(__file__).parents[1] / "docs" / "img" /
         "workflow_diagram.svg")
