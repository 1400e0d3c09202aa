"""Shared helpers for the sweep drivers (run_latent_matrix.py,
run_paper_configs.py): ll.txt scanning and the BENCHMARKS.md
marker-section merge (preserve previously-written rows, canonical row
order, leave the rest of the document untouched)."""
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
