"""Semantic table parser tests (grid/kv clustering, ids, views)."""

import json

from yomitoku_ray.semantic import parse_semantic_html_bytes


def parse(html: str):
    doc, err = parse_semantic_html_bytes(html.encode("utf-8"))
    assert err is None, err
    return doc


def test_grid_table():
    doc = parse(
        "<html><body><table>"
        "<tr><th>name</th><th>qty</th><th>price</th></tr>"
        "<tr><td>apple</td><td>3</td><td>120</td></tr>"
        "<tr><td>banana</td><td>5</td><td>80</td></tr>"
        "</table></body></html>"
    )
    assert len(doc.tables) == 1
    t = doc.tables[0]
    assert t.id == "t0"
    assert len(t.grids) == 1 and len(t.kv_items) == 0
    g = t.grids[0]
    assert g.id == "g0"
    assert (g.n_row, g.n_col) == (3, 3)
    rows = t.grids_to_dict()[0]["rows"]
    assert rows == [
        {"name": "apple", "qty": "3", "price": "120"},
        {"name": "banana", "qty": "5", "price": "80"},
    ]
    # header row excluded from data records; ids are c0.. in sorted order
    assert g.col_headers == [["c0"], ["c1"], ["c2"]]


def test_kv_table_with_key_paths():
    doc = parse(
        "<html><body><table>"
        "<tr><th>name</th><td>Taro</td></tr>"
        "<tr><th>address</th><td>Tokyo</td></tr>"
        "</table></body></html>"
    )
    t = doc.tables[0]
    assert len(t.kv_items) == 2 and len(t.grids) == 0
    kv = t.kv_items_to_dict()
    assert kv == {"name": "Taro", "address": "Tokyo"}
    # kv ids assigned by value-cell y order
    assert [item.id for item in t.kv_items] == ["kv0", "kv1"]


def test_nested_header_key_path():
    doc = parse(
        "<html><body><table>"
        "<tr><th>contact</th><th>phone</th><td>03-1111</td></tr>"
        "<tr><th>contact</th><th>fax</th><td>03-2222</td></tr>"
        "</table></body></html>"
    )
    kv = doc.tables[0].kv_items_to_dict()
    assert kv == {"contact_phone": "03-1111", "contact_fax": "03-2222"}


def test_duplicate_keys_get_index_suffix():
    doc = parse(
        "<html><body><table>"
        "<tr><th>item</th><td>first</td></tr>"
        "<tr><th>item</th><td>second</td></tr>"
        "</table></body></html>"
    )
    kv = doc.tables[0].kv_items_to_dict()
    assert kv == {"item_0": "first", "item_1": "second"}


def test_degenerate_table_demoted_to_paragraph():
    doc = parse(
        "<html><body><p>intro text</p><table><tr><td>only</td></tr></table></body></html>"
    )
    assert len(doc.tables) == 0
    assert any(p.id and p.id.startswith("p") for p in doc.paragraphs)


def test_grid_with_span_cell():
    doc = parse(
        "<html><body><table>"
        "<tr><th>a</th><th>b</th><th>c</th></tr>"
        '<tr><td rowspan="2">big</td><td>x</td><td>y</td></tr>'
        "<tr><td>z</td><td>w</td></tr>"
        "</table></body></html>"
    )
    t = doc.tables[0]
    assert len(t.grids) == 1
    g = t.grids[0]
    assert g.n_row == 3 and g.n_col == 3
    # span cell occupies two rows in the data matrix
    big_id = [cid for cid, c in t.cells.items() if c.contents == "big"][0]
    col0 = [row[0] for row in g.data]
    assert col0.count(big_id) == 2


def test_cell_queries_and_adjacency_search():
    doc = parse(
        "<html><body><table>"
        "<tr><th>total</th><td>9 9 9</td></tr>"
        "<tr><th>date</th><td>2024-01-02</td></tr>"
        "</table></body></html>"
    )
    t = doc.tables[0]
    hits = t.search_cells_by_query("total")
    assert len(hits) == 1
    right = t.search_cells_right_of_key_text("total")
    assert any(c.contents == "999" for c in right)  # aggregate strips spaces
    kvs = doc.search_kv_items_by_key("date")
    assert kvs and kvs[0]["value"].contents == "2024-01-02"


def test_multi_table_cell_id_offsets():
    doc = parse(
        "<html><body>"
        "<table><tr><th>k</th><td>v</td></tr><tr><th>j</th><td>w</td></tr></table>"
        "<p>between</p>"
        "<table><tr><th>x</th><th>y</th></tr><tr><td>1</td><td>2</td></tr>"
        "<tr><td>3</td><td>4</td></tr></table>"
        "</body></html>"
    )
    assert [t.id for t in doc.tables] == ["t0", "t1"]
    ids0 = set(doc.tables[0].cells)
    ids1 = set(doc.tables[1].cells)
    assert not (ids0 & ids1)  # cell-id offset continues across tables
    all_ids = sorted(int(i[1:]) for i in (ids0 | ids1))
    assert all_ids == list(range(len(all_ids)))


def test_tbody_groups_drive_kv_clusters():
    doc = parse(
        "<html><body><table>"
        "<tbody><tr><th>k1</th><td>v1</td></tr></tbody>"
        "<tbody><tr><th>k2</th><td>v2</td></tr></tbody>"
        "</table></body></html>"
    )
    t = doc.tables[0]
    kv = t.kv_items_to_dict()
    assert kv == {"k1": "v1", "k2": "v2"}
    assert any(c.role == "group" for c in t.cells.values())


def test_semantic_document_dump_roundtrip():
    doc = parse(
        "<html><body><table><tr><th>a</th><td>1</td></tr>"
        "<tr><th>b</th><td>2</td></tr></table></body></html>"
    )
    dumped = doc.dump()
    s = json.dumps(dumped, ensure_ascii=False, sort_keys=True)
    assert "kv_items" in s and "grids" in s
