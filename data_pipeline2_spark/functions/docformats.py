"""Real binary-document converters — pure stdlib, deterministic.

The reference converts PDF/DOCX/XLSX/PPTX/HTML to markdown through IBM
Docling (docling_service.py:188-206), a heavyweight external
dependency. The formats themselves are open containers, though:

- OOXML (docx/xlsx/pptx) is a zip of XML parts → zipfile + ElementTree;
- HTML → html.parser;
- PDF text extraction for Flate/plain content streams → zlib + the
  text-showing operators (Tj/TJ/') of the public PDF spec.

These converters cover the structured-text core of what docling emits
(headings, paragraphs, tables, slides) deterministically, which is what
a 100 TB ingest pipeline needs from the conversion stage. Scanned-image
PDFs, OCR, and layout analysis genuinely need the external stack and
still raise NotImplementedError at the same seam.

Fixture writers (make_docx/xlsx/pptx/pdf_doc/html_doc) emit real files
of each format with content a pure function of an integer id, so driver
oracles can verify the converters end-to-end: the oracle recomputes the
markdown the generator implies, the engine re-derives it from actual
container bytes.
"""

from __future__ import annotations

import io
import re
import struct
import zipfile
import zlib
from xml.etree import ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"


# ------------------------------------------------------------------ docx

def docx_to_markdown(payload: bytes) -> str:
    """word/document.xml → markdown: HeadingN styles → #-prefixes,
    paragraphs → blocks, w:tbl → markdown tables."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        root = ET.fromstring(zf.read("word/document.xml"))
    body = root.find(f"{_W}body")
    blocks: list[str] = []
    for el in body if body is not None else []:
        if el.tag == f"{_W}p":
            text = "".join(t.text or "" for t in el.iter(f"{_W}t"))
            if not text.strip():
                continue
            style = el.find(f"{_W}pPr/{_W}pStyle")
            sval = style.get(f"{_W}val", "") if style is not None else ""
            m = re.fullmatch(r"Heading(\d)", sval)
            blocks.append(("#" * int(m.group(1)) + " " if m else "") + text)
        elif el.tag == f"{_W}tbl":
            rows = []
            for tr in el.iter(f"{_W}tr"):
                cells = [
                    "".join(t.text or "" for t in tc.iter(f"{_W}t"))
                    for tc in tr.iter(f"{_W}tc")
                ]
                rows.append("| " + " | ".join(cells) + " |")
            if rows:
                header_sep = "| " + " | ".join(
                    "---" for _ in rows[0].split("|")[1:-1]
                ) + " |"
                blocks.append("\n".join([rows[0], header_sep, *rows[1:]]))
    return "\n\n".join(blocks)


# ------------------------------------------------------------------ xlsx

def _xlsx_cell_ref_col(ref: str) -> int:
    col = 0
    for ch in ref:
        if ch.isalpha():
            col = col * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return col - 1


def xlsx_to_markdown(payload: bytes) -> str:
    """Each worksheet → '## <sheet name>' + a markdown table. Shared
    strings and inline values resolved; gaps padded per cell refs."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sroot = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(f"{_S}t"))
                for si in sroot.iter(f"{_S}si")
            ]
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheets = [
            (s.get("name", f"Sheet{i+1}"), f"xl/worksheets/sheet{i+1}.xml")
            for i, s in enumerate(wb.iter(f"{_S}sheet"))
        ]
        out: list[str] = []
        for name, part in sheets:
            if part not in zf.namelist():
                continue
            ws = ET.fromstring(zf.read(part))
            rows: list[list[str]] = []
            for row in ws.iter(f"{_S}row"):
                cells: list[str] = []
                for c in row.iter(f"{_S}c"):
                    idx = _xlsx_cell_ref_col(c.get("r", ""))
                    v = c.find(f"{_S}v")
                    val = v.text if v is not None and v.text else ""
                    if c.get("t") == "s" and val:
                        val = shared[int(val)]
                    while len(cells) < idx:
                        cells.append("")
                    cells.append(val)
                rows.append(cells)
            if not rows:
                continue
            width = max(len(r) for r in rows)
            rows = [r + [""] * (width - len(r)) for r in rows]
            table = ["| " + " | ".join(r) + " |" for r in rows]
            sep = "| " + " | ".join("---" for _ in range(width)) + " |"
            out.append(f"## {name}\n\n" + "\n".join([table[0], sep, *table[1:]]))
    return "\n\n".join(out)


# ------------------------------------------------------------------ pptx

def pptx_to_markdown(payload: bytes) -> str:
    """ppt/slides/slideN.xml, in slide order → '## Slide N' sections
    with one line per text paragraph (a:p / a:t runs)."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        slide_parts = sorted(
            (n for n in zf.namelist()
             if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(re.search(r"\d+", n.split("/")[-1]).group()),
        )
        out = []
        for i, part in enumerate(slide_parts, 1):
            root = ET.fromstring(zf.read(part))
            lines = []
            for p in root.iter(f"{_A}p"):
                text = "".join(t.text or "" for t in p.iter(f"{_A}t"))
                if text.strip():
                    lines.append(text)
            out.append(f"## Slide {i}" + ("\n\n" + "\n".join(lines) if lines else ""))
    return "\n\n".join(out)


# ------------------------------------------------------------------ html

def html_to_markdown(payload: bytes) -> str:
    """h1-h6 → #-prefixes, p → blocks, li → '- ' lines. Scripts/styles
    dropped. Deterministic, whitespace-normalized."""
    from html.parser import HTMLParser

    class MD(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.blocks: list[str] = []
            self.cur: list[str] = []
            self.prefix = ""
            self.skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style", "title"):
                self.skip += 1
            elif re.fullmatch(r"h[1-6]", tag):
                self._flush()
                self.prefix = "#" * int(tag[1]) + " "
            elif tag == "li":
                self._flush()
                self.prefix = "- "
            elif tag == "p":
                self._flush()

        def handle_endtag(self, tag):
            if tag in ("script", "style", "title"):
                self.skip = max(0, self.skip - 1)
            elif re.fullmatch(r"h[1-6]|li|p", tag):
                self._flush()

        def handle_data(self, data):
            if not self.skip:
                self.cur.append(data)

        def _flush(self):
            text = re.sub(r"\s+", " ", "".join(self.cur)).strip()
            if text:
                self.blocks.append(self.prefix + text)
            self.cur, self.prefix = [], ""

    p = MD()
    p.feed(payload.decode("utf-8", errors="replace"))
    p._flush()
    # list items group into one block; other blocks separate
    out: list[str] = []
    for b in p.blocks:
        if b.startswith("- ") and out and out[-1].startswith("- "):
            out[-1] += "\n" + b
        else:
            out.append(b)
    return "\n\n".join(out)


# ------------------------------------------------------------------- pdf

_PDF_TEXT_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|')")
_PDF_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\]])*)\]\s*TJ")
_PDF_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")


def _pdf_unescape(raw: bytes) -> str:
    return (
        raw.replace(rb"\(", b"(")
        .replace(rb"\)", b")")
        .replace(rb"\\", b"\\")
        .decode("latin-1")
    )


def pdf_extract_text(payload: bytes) -> str:
    """Text-showing operators (Tj / TJ / ') from plain or FlateDecode
    content streams — the deterministic core of PDF text extraction.
    Encrypted PDFs, exotic filters, and image-only pages raise
    NotImplementedError (the docling/OCR plug-in point)."""
    if not payload.startswith(b"%PDF"):
        raise ValueError("not a PDF payload")
    if b"/Encrypt" in payload:
        raise NotImplementedError("encrypted PDF needs a full PDF stack")
    chunks: list[str] = []
    for m in re.finditer(rb"stream\r?\n", payload):
        start = m.end()
        # this stream's dict: for /Length (binary data may end in \r or
        # \n bytes, so EOL-trimming before `endstream` corrupts it) and
        # for /Filter
        head = payload[max(0, m.start() - 400) : m.start()]
        dict_part = head.rsplit(b"<<", 1)[-1]
        lm = re.search(rb"/Length\s+(\d+)", dict_part)
        if lm:
            data = payload[start : start + int(lm.group(1))]
        else:
            end = payload.find(b"endstream", start)
            if end < 0:
                continue
            data = re.sub(rb"\r?\n\Z", b"", payload[start:end])
        if b"/FlateDecode" in dict_part:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        for t in _PDF_TEXT_RE.findall(data):
            chunks.append(_pdf_unescape(t))
        for arr in _PDF_TJ_ARRAY_RE.findall(data):
            parts = [_pdf_unescape(s) for s in _PDF_STR_RE.findall(arr)]
            if parts:
                chunks.append("".join(parts))
    if not chunks:
        raise NotImplementedError(
            "no extractable text operators found (image-only or "
            "unsupported filter) — needs the OCR/docling stack"
        )
    return "\n".join(chunks)


# ------------------------------------------------- deterministic fixtures

_ZIP_DATE = (2024, 1, 1, 0, 0, 0)


def _zip_bytes(parts: dict[str, str]) -> bytes:
    """Deterministic zip: fixed timestamps, sorted names, stored (no
    per-build zlib variance)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name in sorted(parts):
            zi = zipfile.ZipInfo(name, date_time=_ZIP_DATE)
            zf.writestr(zi, parts[name])
    return buf.getvalue()


_CT_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="xml" ContentType="application/xml"/></Types>"""


def make_docx(doc_id: int) -> bytes:
    """Real DOCX: Heading1 title + body paragraph + a 2x2 table."""
    w = _W.strip("{}")
    document = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document xmlns:w="{w}"><w:body>
<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>Document {doc_id}</w:t></w:r></w:p>
<w:p><w:r><w:t>Body text for document {doc_id}.</w:t></w:r></w:p>
<w:tbl>
<w:tr><w:tc><w:p><w:r><w:t>key</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>value</w:t></w:r></w:p></w:tc></w:tr>
<w:tr><w:tc><w:p><w:r><w:t>id</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>{doc_id}</w:t></w:r></w:p></w:tc></w:tr>
</w:tbl>
</w:body></w:document>"""
    return _zip_bytes(
        {"[Content_Types].xml": _CT_XML, "word/document.xml": document}
    )


def make_xlsx(doc_id: int) -> bytes:
    """Real XLSX: one sheet, header row + one data row (shared strings)."""
    s = _S.strip("{}")
    workbook = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="{s}"><sheets><sheet name="Data" sheetId="1"/></sheets></workbook>"""
    shared = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="{s}" count="3" uniqueCount="3"><si><t>metric</t></si><si><t>value</t></si><si><t>doc</t></si></sst>"""
    sheet = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="{s}"><sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>{doc_id}</v></c></row>
</sheetData></worksheet>"""
    return _zip_bytes(
        {
            "[Content_Types].xml": _CT_XML,
            "xl/workbook.xml": workbook,
            "xl/sharedStrings.xml": shared,
            "xl/worksheets/sheet1.xml": sheet,
        }
    )


def make_pptx(doc_id: int) -> bytes:
    """Real PPTX: two slides with one text run each."""
    a = _A.strip("{}")

    def slide(text):
        return f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"
 xmlns:a="{a}"><p:cSld><p:spTree>
<p:sp><p:txBody><a:p><a:r><a:t>{text}</a:t></a:r></a:p></p:txBody></p:sp>
</p:spTree></p:cSld></p:sld>"""

    return _zip_bytes(
        {
            "[Content_Types].xml": _CT_XML,
            "ppt/slides/slide1.xml": slide(f"Deck {doc_id}"),
            "ppt/slides/slide2.xml": slide(f"Summary {doc_id}"),
        }
    )


def make_pdf_doc(doc_id: int) -> bytes:
    """Real single-page PDF with a FlateDecode text content stream."""
    text = f"PDF body {doc_id}"
    content = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode("latin-1")
    comp = zlib.compress(content, 6)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >>",
        b"<< /Length "
        + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + comp
        + b"\nendstream",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objs)+1}\n".encode())
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(f"{off:010d} 00000 n \n".encode())
    out.write(
        f"trailer\n<< /Size {len(objs)+1} /Root 1 0 R >>\n"
        f"startxref\n{xref}\n%%EOF\n".encode()
    )
    return out.getvalue()


def make_html_doc(doc_id: int) -> bytes:
    return (
        f"<html><head><title>t</title><style>p{{}}</style></head><body>"
        f"<h1>Page {doc_id}</h1><p>Paragraph for page {doc_id}.</p>"
        f"<ul><li>alpha {doc_id}</li><li>beta {doc_id}</li></ul>"
        f"</body></html>"
    ).encode()
