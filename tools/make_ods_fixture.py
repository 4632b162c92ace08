#!/usr/bin/env python3
"""One-shot generator for the REAL ODS container fixture.

Writes, from ONE grid definition (single source of truth, so the two
artifacts cannot drift):

  fixtures/ida_raw_2024_stfc.ods      — a genuine OpenDocument Spreadsheet
      zip container (mimetype first entry STORED, META-INF/manifest.xml,
      content.xml) holding the STFC sheet `Telefonia_Fixa` plus the decoy
      `Notas` sheet that must never be parsed. The sheet uses the real ODF
      encodings the engine-side parser must honor: merged group cells
      (table:number-rows-spanned + table:covered-table-cell), run-length
      empty cells (table:number-columns-repeated), and LibreOffice's
      trailing padding (an empty row repeated ~1M times spanning 16384
      repeated empty cells) that a naive expander would materialize.
  fixtures/ods_oracle_2024_stfc.csv   — the same logical grid as a
      semicolon CSV for the DuckDB oracle (DuckDB cannot read ODS); its
      name deliberately does NOT match the catalog's ida[_-]raw pattern so
      discovery never picks it up as a resource.

Mirrors the committed 2023 STFC workbook-directory fixture
(fixtures/ida_raw_2023_stfc.wb) shifted to 2024 so catalog discovery with
anosAlvo=[2024] finds exactly this one resource.

Run from the repo root:  python3 tools/make_ods_fixture.py
"""
import zipfile
from xml.sax.saxutils import escape

# (cells, rows_spanned_for_first_cell) — None cell = covered (merged
# continuation); "" = genuinely empty cell. 6-column logical grid.
GRID = [
    (["Anatel - Indice de Desempenho no Atendimento (IDA)", "", "", "", "", ""], 1),
    (["STFC - Telefonia Fixa Comutada", "", "", "", "", ""], 1),
    (["Atualizado em: 15/01/2025", "", "", "", "", ""], 1),
    (["GRUPO ECONOMICO", "VARIAVEL", "SERVICO", "2024-01", "2024-02", "2024-03"], 1),
    (["ALGAR TELECOM S/A", "Indicador de Desempenho no Atendimento (IDA)",
      "STFC", "80,55", "81,37", "82,02"], 3),
    ([None, "Taxa de Respondidas em 5 dias Úteis", "STFC",
      "87,90%", "88,41%", "89,15%"], 1),
    ([None, "Quantidade de reclamações", "STFC", "2.512", "2.444", "2.390"], 1),
    (["OI S.A.", "Indicador de Desempenho no Atendimento (IDA)",
      "STFC", "71,64", "-", "72,31"], 3),
    ([None, "Taxa de Respondidas em 5 dias Úteis", "STFC",
      "79,02%", "78,55%", ""], 1),
    ([None, "Quantidade de reclamações", "STFC", "59.884", "60.112", "58.903"], 1),
    (["TELEFÔNICA BRASIL S.A.", "Indicador de Desempenho no Atendimento (IDA)",
      "STFC", "85,92", "86,34", "85,47"], 3),
    ([None, "Taxa de Respondidas em 5 dias Úteis", "STFC",
      "91,78%", "92,12%", "90,95%"], 1),
    ([None, "Quantidade de reclamações", "STFC", "36.421", "35.980", "37.015"], 1),
    (["nan", "Observacao: valores preliminares sujeitos a revisao",
      "", "", "", ""], 1),
]

NOTAS = [
    ["Notas metodologicas", "", ""],
    ["Este arquivo descreve a metodologia de calculo do IDA", "", ""],
    ["Nao contem dados mensais — uso interno", "", ""],
]


def cell_xml(value, rows_spanned=1):
    if value is None:
        return "<table:covered-table-cell/>"
    if value == "":
        return "<table:table-cell/>"
    span = (f' table:number-rows-spanned="{rows_spanned}"'
            ' table:number-columns-spanned="1"') if rows_spanned > 1 else ""
    return (f'<table:table-cell{span} office:value-type="string">'
            f"<text:p>{escape(value)}</text:p></table:table-cell>")


def row_xml(cells, first_span=1):
    # run-length-encode trailing empties the way real writers do
    body = []
    trailing_empty = 0
    for j, c in enumerate(cells):
        if c == "":
            trailing_empty += 1
            continue
        if trailing_empty:
            body.append(f'<table:table-cell table:number-columns-repeated='
                        f'"{trailing_empty}"/>')
            trailing_empty = 0
        body.append(cell_xml(c, first_span if j == 0 else 1))
    if trailing_empty:
        body.append(f'<table:table-cell table:number-columns-repeated='
                    f'"{trailing_empty}"/>')
    return "<table:table-row>" + "".join(body) + "</table:table-row>"


def table_xml(name, rows):
    parts = [f'<table:table table:name="{name}">',
             '<table:table-column table:number-columns-repeated="16384"/>']
    for cells, span in rows:
        parts.append(row_xml(cells, span))
    # LibreOffice's real trailing padding: one empty row repeated to the
    # sheet bound, each spanning the full repeated-empty column range —
    # a parser that eagerly expands this materializes ~17G cells
    parts.append('<table:table-row table:number-rows-repeated="1048562">'
                 '<table:table-cell table:number-columns-repeated="16384"/>'
                 "</table:table-row>")
    parts.append("</table:table>")
    return "".join(parts)


CONTENT = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    "<office:document-content"
    ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
    ' xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"'
    ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
    ' office:version="1.3">'
    "<office:body><office:spreadsheet>"
    + table_xml("Notas", [(r, 1) for r in NOTAS])
    + table_xml("Telefonia_Fixa", GRID)
    + "</office:spreadsheet></office:body></office:document-content>"
)

MANIFEST = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    "<manifest:manifest"
    ' xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0"'
    ' manifest:version="1.3">'
    '<manifest:file-entry manifest:full-path="/" manifest:media-type='
    '"application/vnd.oasis.opendocument.spreadsheet"/>'
    '<manifest:file-entry manifest:full-path="content.xml"'
    ' manifest:media-type="text/xml"/>'
    "</manifest:manifest>"
)


def main():
    ods = "fixtures/ida_raw_2024_stfc.ods"
    csv = "fixtures/ods_oracle_2024_stfc.csv"
    with zipfile.ZipFile(ods, "w") as z:
        # per ODF spec the mimetype entry comes first, uncompressed
        z.writestr("mimetype",
                   "application/vnd.oasis.opendocument.spreadsheet",
                   compress_type=zipfile.ZIP_STORED)
        z.writestr("META-INF/manifest.xml", MANIFEST,
                   compress_type=zipfile.ZIP_DEFLATED)
        z.writestr("content.xml", CONTENT, compress_type=zipfile.ZIP_DEFLATED)
    with open(csv, "w", encoding="utf-8") as f:
        for cells, _ in GRID:
            f.write(";".join("" if c is None else c for c in cells) + "\n")
    print(f"wrote {ods} and {csv}")


if __name__ == "__main__":
    main()
