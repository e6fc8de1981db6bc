"""Extract the 14 evaluation trees from the reference's
``Trees for OS Assignment-2.docx`` into reference-format text files
(``tests/data/assignment_trees/G{1..14}.txt``): first line N, then the
N-line 0/1 adjacency matrix — byte-compatible with the reference's
own G1.txt/G2.txt/G3.txt input format (primary_server.c reads the
same layout).

One-shot provenance tool: the extracted fixtures are committed; rerun
only to re-derive them from the docx.

    python scripts/extract_assignment_trees.py /path/to/Trees.docx out_dir
"""

import re
import sys
import zipfile


def extract(docx_path: str):
    with zipfile.ZipFile(docx_path) as z:
        xml = z.read("word/document.xml").decode("utf-8")
    paras = re.findall(r"<w:p[ >].*?</w:p>", xml, re.S)
    lines = []
    for p in paras:
        texts = re.findall(r"<w:t[^>]*>(.*?)</w:t>", p, re.S)
        lines.append("".join(texts))
    graphs = {}
    i = 0
    while i < len(lines):
        m = re.match(r"^(G\d+)\.txt$", lines[i].strip())
        if m:
            name = m.group(1)
            n = int(lines[i + 1])
            rows = [[int(x) for x in lines[i + 2 + j].split()] for j in range(n)]
            assert all(len(r) == n for r in rows), name
            graphs[name] = rows
            i += 2 + n
        else:
            i += 1
    return graphs


def main() -> None:
    docx, out_dir = sys.argv[1], sys.argv[2]
    import os

    os.makedirs(out_dir, exist_ok=True)
    graphs = extract(docx)
    for name, rows in sorted(graphs.items(), key=lambda kv: int(kv[0][1:])):
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(f"{len(rows)}\n")
            for r in rows:
                f.write(" ".join(map(str, r)) + "\n")
        print(f"wrote {path} ({len(rows)} vertices)")


if __name__ == "__main__":
    main()
