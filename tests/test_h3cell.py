"""H3 cell-index parity gates.

Hard gates:
  * the reference BVT's own golden vector
    (test/distributed/cases/geo/geo_s2h3.result): the center of the res-5
    cell at POINT(0 0) plus every structural fact that file checks
    (default res 15, explicit res honoured, 6 boundary vertices, parent
    resolutions, 6 neighbours, self-is-not-a-neighbour, neighbour symmetry,
    cross-resolution pairs are not neighbours, error/NULL contracts);
  * the canonical published H3 example pair
    latLngToCell(37.7752702151959, -122.418307270836, 9) == 0x8928308280fffff
    and its cellToLatLng center — this is *bit-exact* on the index;
  * global structural invariants over a lat/lng sweep (roundtrip,
    center-based parent consistency, 122 res-0 cells with exactly the 12
    published pentagon base cells).
"""

from __future__ import annotations

from matrixone_spark.functions.h3cell import (
    are_neighbor_cells,
    cell_boundary,
    cell_is_pentagon,
    cell_to_latlng,
    cell_to_parent,
    get_resolution,
    grid_neighbors,
    is_valid_cell,
    latlng_to_cell,
)


def test_canonical_published_golden():
    h = latlng_to_cell(37.7752702151959257, -122.418307270836, 9)
    assert h == 0x8928308280FFFFF
    lat, lng = cell_to_latlng(h)
    assert abs(lat - 37.77670234943567) < 1e-11
    assert abs(lng - -122.41845932318311) < 1e-11


def test_bvt_golden_vectors():
    # geo_s2h3.result — default res is 15, explicit res honoured
    assert get_resolution(latlng_to_cell(39.9087, 116.3975, 15)) == 15
    assert get_resolution(latlng_to_cell(39.9087, 116.3975, 7)) == 7
    # center of the res-5 cell at POINT(0 0): golden float vector
    c5 = latlng_to_cell(0.0, 0.0, 5)
    lat, lng = cell_to_latlng(c5)
    assert abs(lng - -0.01529110942779935) < 1e-9
    assert abs(lat - 0.06368407237240811) < 1e-9
    # boundary is 6 vertices for this hexagon
    assert len(cell_boundary(c5)) == 6
    # parent resolutions: immediate parent is res-1; explicit parent honoured
    c7 = latlng_to_cell(0.0, 0.0, 7)
    assert get_resolution(cell_to_parent(c7)) == 6
    assert get_resolution(cell_to_parent(c7, 3)) == 3
    # 6 neighbours; self is not a neighbour; first neighbour is mutual
    nbs = grid_neighbors(c7)
    assert len(nbs) == 6
    assert not are_neighbor_cells(c7, c7)
    assert are_neighbor_cells(c7, nbs[0]) and are_neighbor_cells(nbs[0], c7)
    # cross-resolution pairs are not neighbours
    assert not are_neighbor_cells(c7, cell_to_parent(c7, 3))
    # invalid index errors
    for bad in (0, 1, 0xFFFFFFFFFFFFFFF):
        assert not is_valid_cell(bad)
    try:
        cell_to_parent(0)
        raised = False
    except ValueError:
        raised = True
    assert raised
    # out-of-range coordinates error (geo_s2h3.sql POINT(0 95))
    try:
        latlng_to_cell(95.0, 0.0, 9)
        raised = False
    except ValueError:
        raised = True
    assert raised
    # parent errors: res-0 has no parent; finer-than-cell parent rejected
    c0 = latlng_to_cell(0.0, 0.0, 0)
    assert get_resolution(c0) == 0
    for call in (lambda: cell_to_parent(c0), lambda: cell_to_parent(latlng_to_cell(0, 0, 3), 7)):
        try:
            call()
            raised = False
        except ValueError:
            raised = True
        assert raised


def test_roundtrip_and_parent_sweep():
    cells = set()
    for lat0 in range(-88, 89, 11):
        for lng0 in range(-178, 180, 13):
            lat, lng = lat0 + 0.37, lng0 + 0.21
            for res in (1, 4, 9):
                c = latlng_to_cell(lat, lng, res)
                assert is_valid_cell(c) and get_resolution(c) == res
                clat, clng = cell_to_latlng(c)
                # the center re-indexes to the same cell
                assert latlng_to_cell(clat, clng, res) == c
                # child centers lie inside the parent
                assert cell_to_parent(c, res - 1) == latlng_to_cell(clat, clng, res - 1)
                cells.add(c)
    assert len(cells) > 500


def test_res0_census_and_pentagons():
    res0 = set()
    for lat0 in range(-89, 90, 3):
        for lng0 in range(-179, 180, 3):
            res0.add(latlng_to_cell(lat0 + 0.11, lng0 + 0.43, 0))
    assert len(res0) == 122
    pents = sorted((c >> 45) & 127 for c in res0 if cell_is_pentagon(c))
    assert pents == [4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117]


def test_pentagon_cells():
    # every pentagon cell has 5 boundary vertices and 5 mutual neighbours
    pent0 = [c for c in (latlng_to_cell(lat, lng, 0)
                         for lat, lng in ((58.0, 10.0), (-58.0, -170.0), (31.0, 30.0)))
             ]
    # locate actual pentagons from the census instead
    res0 = set()
    for lat0 in range(-89, 90, 4):
        for lng0 in range(-179, 180, 4):
            res0.add(latlng_to_cell(lat0 + 0.11, lng0 + 0.43, 0))
    pents = [c for c in res0 if cell_is_pentagon(c)]
    assert len(pents) == 12
    for c in pents[:6]:
        lat, lng = cell_to_latlng(c)
        for res in (2, 3):
            pc = latlng_to_cell(lat, lng, res)
            assert cell_is_pentagon(pc)
            assert len(cell_boundary(pc)) == 5
            nbs = grid_neighbors(pc)
            assert len(nbs) == 5
            for nb in nbs:
                assert are_neighbor_cells(nb, pc) and are_neighbor_cells(pc, nb)


def test_neighbor_symmetry_hexagons():
    for lat, lng in ((37.77, -122.42), (39.9, 116.4), (-33.9, 151.2), (0.01, 0.01), (51.5, -0.1)):
        for res in (3, 6):
            c = latlng_to_cell(lat, lng, res)
            nbs = grid_neighbors(c)
            assert len(nbs) == 6
            for nb in nbs:
                assert get_resolution(nb) == res
                assert are_neighbor_cells(nb, c)
            # neighbours of neighbours include the original
            back = grid_neighbors(nbs[0])
            assert c in back
