"""Shared helpers for the sweep drivers (run_latent_matrix.py,
run_paper_configs.py): ll.txt scanning and the BENCHMARKS.md
marker-section merge (preserve previously-written rows, canonical row
order, leave the rest of the document untouched)."""
import json
import os


def read_ll(run_name, path="ll.txt"):
    """Last importance-sampled LL recorded for `run_name` (None if absent).

    The CLI appends one "name : ll" line per finished run
    (the reference's format, main.py:142-143)."""
    ll = None
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.startswith(f"{run_name} :"):
                    # rsplit: run names may themselves contain ':'
                    ll = float(line.rsplit(":", 1)[1])
    return ll


def _pose_pin_note(data_dir):
    """'; poses pinned (...)' when the dataset renders from a committed
    manifest — absolute numbers then compare across rounds/hosts."""
    base = os.path.basename(os.path.normpath(data_dir or ""))
    if os.path.exists(os.path.join("data_poses", base + ".npz")):
        return f"; poses pinned (data_poses/{base}.npz)"
    return ""


BASELINE_STORE = "converged_state/baseline_tables.json"


def update_baseline_store(kind, results, meta=None, path=BASELINE_STORE):
    """Persist one driver's five-config results ('wall' from
    run_baseline_configs, 'chip' from bench_chip_rates) so the unified
    BASELINE table can render both columns regardless of which driver ran
    last. Returns the merged store."""
    store = {}
    if os.path.exists(path):
        with open(path) as f:
            store = json.load(f)
    store.setdefault(kind, {}).update(results)
    if meta is not None:
        store.setdefault("meta", {})[kind] = meta
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(store, f, indent=1)
    os.replace(tmp, path)
    return store


def write_baseline_sweep(store, out_path, descriptions):
    """Render the unified five-config BASELINE table: the session-stable
    scan-amortized chip rate is the primary throughput column; the
    wall-clock rate (which carries 2-3x session variance from the
    tunneled runtime's dispatch latency) is kept as a secondary column."""
    wall, chip = store.get("wall", {}), store.get("chip", {})
    meta = store.get("meta", {})
    wm, cm = meta.get("wall", {}), meta.get("chip", {})
    caption = (
        "Backend: tpu; compute_dtype="
        f"{wm.get('compute_dtype', 'bfloat16')}; spherecube data from the "
        f"in-repo renderer ({wm.get('n_images', 2048)} images / "
        f"{wm.get('n_pairs', 512)} pairs), pose-pinned. **Chip steps/s** "
        "(the quotable throughput) is the scan-amortized rate of the "
        "harness's own compiled multi-step train program on "
        "device-resident data, queue drained by scalar readback "
        f"(`scripts/bench_chip_rates.py`, scan_k={cm.get('scan_k', 64)}) — "
        "session-stable. *Wall steps/s* is the end-to-end smoke-run rate "
        "including per-epoch eval and the tunneled dispatch path "
        "(`scripts/run_baseline_configs.py`, steps_per_call="
        f"{wm.get('steps_per_call', 16)}); it carries 2-3x session "
        "variance and is secondary. Quality columns come from the wall "
        "smoke runs.")
    lines = [caption, "",
             "| config | chip steps/s | wall steps/s | steps "
             "| recon start | recon end | KL end |",
             "|---|---|---|---|---|---|---|"]
    for name, desc in descriptions.items():
        w, c = wall.get(name), chip.get(name)
        if w is None and c is None:
            continue
        cs = f"**{c['chip_steps_per_sec']}**" if c else "—"
        lines.append(
            f"| {desc} | {cs} "
            f"| {w['steps_per_sec'] if w else '—'} "
            f"| {w['steps'] if w else '—'} "
            f"| {w['recon_first'] if w else '—'} "
            f"| {w['recon_last'] if w else '—'} "
            f"| {w['kl_last'] if w else '—'} |")
    begin, end = ("<!-- baseline-sweep:begin -->",
                  "<!-- baseline-sweep:end -->")
    block = f"{begin}\n" + "\n".join(lines) + f"\n{end}"
    doc = open(out_path).read() if os.path.exists(out_path) else ""
    if begin in doc and end in doc:
        doc = doc.split(begin)[0] + block + doc.split(end, 1)[1]
    else:
        doc = doc.rstrip() + "\n\n" + block + "\n"
    with open(out_path, "w") as f:
        f.write(doc)
    print(f"wrote {out_path} (unified baseline-sweep)")


def merge_marker_table(out_path, begin, end, caption, header, descriptions,
                       results, format_row, section_title):
    """Write/refresh a marker-delimited results table in `out_path`.

    descriptions: ordered {config_name: row_label}; results:
    {config_name: result}; format_row(desc, result) -> "| ... |" row.
    Rows for configs absent from `results` are preserved verbatim from
    the existing table (matched by their row label), keeping
    `descriptions` order.
    """
    lines = [caption, "", header,
             "|" + "---|" * (header.count("|") - 1)]
    doc = ""
    if os.path.exists(out_path):
        with open(out_path) as f:
            doc = f.read()

    header_first_col = header.split("|")[1].strip()
    old_rows = {}
    if begin in doc and end in doc:
        for row in doc.split(begin)[1].split(end)[0].splitlines():
            if row.startswith("| ") and not row.startswith(
                    f"| {header_first_col}"):
                old_rows[row.split("|")[1].strip()] = row
    for name, desc in descriptions.items():
        if name in results:
            lines.append(format_row(desc, results[name]))
        elif desc in old_rows:
            lines.append(old_rows[desc])
    block = f"{begin}\n" + "\n".join(lines) + f"\n{end}"

    if begin in doc and end in doc:
        doc = doc.split(begin)[0] + block + doc.split(end, 1)[1]
    elif doc:
        doc = doc.rstrip() + f"\n\n## {section_title}\n\n" + block + "\n"
    else:
        doc = f"# {section_title}\n\n" + block + "\n"
    with open(out_path, "w") as f:
        f.write(doc)
    print(f"wrote {out_path}")
