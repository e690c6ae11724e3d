"""Excel ingest e2e — the reference's only input format
(window.py:296 ``pd.read_excel(sheet_name=None)``). The container has
no openpyxl, so this exercises the stdlib ECMA-376 fallback parser:
a fixture .xlsx is built in-test (xlsx = zip of XML parts), ingested
whole-workbook, and the resulting Spark schemas/values are asserted
against the reference's untyped-load + convert_dtypes semantics.
"""

import zipfile

import pytest

from database_importer_spark.sources.loader import ingest_excel

_M = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG = "http://schemas.openxmlformats.org/package/2006/relationships"


def _write_fixture_xlsx(path: str) -> None:
    """Two-sheet workbook: sheet1 uses sharedStrings + ints + floats +
    booleans + a blank cell; sheet2 uses inline strings."""
    shared = ["id", "item", "quantity", "price", "in_stock",
              "ID000001", "Apple", "ID000002", "Pear"]
    ss = (
        f'<sst xmlns="{_M}" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    sheet1 = f"""<worksheet xmlns="{_M}"><sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
<c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c>
<c r="E1" t="s"><v>4</v></c></row>
<row r="2"><c r="A2" t="s"><v>5</v></c><c r="B2" t="s"><v>6</v></c>
<c r="C2"><v>5</v></c><c r="D2"><v>10.5</v></c>
<c r="E2" t="b"><v>1</v></c></row>
<row r="3"><c r="A3" t="s"><v>7</v></c><c r="B3" t="s"><v>8</v></c>
<c r="D3"><v>9</v></c><c r="E3" t="b"><v>0</v></c></row>
</sheetData></worksheet>"""
    sheet2 = f"""<worksheet xmlns="{_M}"><sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>code</t></is></c>
<c r="B1" t="inlineStr"><is><t>ratio</t></is></c></row>
<row r="2"><c r="A2" t="inlineStr"><is><t>X1</t></is></c>
<c r="B2"><v>0.25</v></c></row>
</sheetData></worksheet>"""
    workbook = (
        f'<workbook xmlns="{_M}" xmlns:r="{_R}"><sheets>'
        '<sheet name="groceries" sheetId="1" r:id="rId1"/>'
        '<sheet name="ratios" sheetId="2" r:id="rId2"/>'
        "</sheets></workbook>"
    )
    wb_rels = (
        f'<Relationships xmlns="{_PKG}">'
        '<Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="x" Target="worksheets/sheet2.xml"/>'
        "</Relationships>"
    )
    root_rels = (
        f'<Relationships xmlns="{_PKG}">'
        '<Relationship Id="rId1" Type="x" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    content_types = (
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/sharedStrings.xml", ss)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
        z.writestr("xl/worksheets/sheet2.xml", sheet2)


def test_ingest_excel_runs_end_to_end(spark, tmp_path):
    path = str(tmp_path / "fixture.xlsx")
    _write_fixture_xlsx(path)
    out = ingest_excel(spark, path)
    assert set(out) == {"groceries", "ratios"}

    g = out["groceries"]
    assert g.columns == ["id", "item", "quantity", "price", "in_stock"]
    # convert_dtypes inference surviving into the Spark schema
    types = {f.name: f.dataType.simpleString() for f in g.schema.fields}
    assert types["quantity"] in ("bigint", "int")
    assert types["price"] == "double"
    assert types["id"] == "string"
    assert types["in_stock"] == "boolean"
    rows = {r["id"]: r for r in g.collect()}
    assert rows["ID000001"]["quantity"] == 5
    assert rows["ID000001"]["price"] == 10.5
    assert rows["ID000001"]["in_stock"] is True
    # blank cell → NULL; integral-looking numeric stays integral
    assert rows["ID000002"]["quantity"] is None
    assert rows["ID000002"]["price"] == 9.0
    assert rows["ID000002"]["in_stock"] is False

    r2 = out["ratios"].collect()
    assert [c for c in out["ratios"].columns] == ["code", "ratio"]
    assert r2[0]["code"] == "X1" and r2[0]["ratio"] == 0.25


def test_ingest_excel_mixed_column_falls_back_to_string(spark, tmp_path):
    """A column mixing text and numbers stays string after inference —
    the reference's convert_dtypes behavior on dirty sheets."""
    path = str(tmp_path / "mixed.xlsx")
    m = _M
    sheet = f"""<worksheet xmlns="{m}"><sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>val</t></is></c></row>
<row r="2"><c r="A2" t="inlineStr"><is><t>abc</t></is></c></row>
<row r="3"><c r="A3"><v>7</v></c></row>
</sheetData></worksheet>"""
    workbook = (
        f'<workbook xmlns="{m}" xmlns:r="{_R}"><sheets>'
        '<sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        f'<Relationships xmlns="{_PKG}">'
        '<Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("_rels/.rels", "<Relationships/>")
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    out = ingest_excel(spark, path)
    df = out["s"]
    # mixed object column: values preserved, no silent coercion
    vals = sorted(str(r["val"]) for r in df.collect())
    assert vals == ["7", "abc"]
