"""GDML/RATDB loader tests on a small hand-written detector."""
import json
import textwrap

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from chroma_tpu.rat import RATGeoLoader, RatDBParser

GDML = textwrap.dedent("""\
<?xml version="1.0" encoding="UTF-8" standalone="no" ?>
<gdml>
  <define>
    <position name="pmtpos" unit="mm" x="0" y="0" z="400"/>
    <rotation name="norot" unit="deg" x="0" y="0" z="0"/>
    <matrix name="RI_WATER" coldim="2"
            values="1.5e-06 1.33 5.0e-06 1.36"/>
    <matrix name="ABS_WATER" coldim="2"
            values="1.5e-06 50000 5.0e-06 20000"/>
    <matrix name="REFL" coldim="2" values="1.5e-06 0.9 5.0e-06 0.9"/>
  </define>
  <materials>
    <material name="water">
      <D value="1.0" unit="g/cm3"/>
      <fraction n="1.0" ref="H2O"/>
      <property name="RINDEX" ref="RI_WATER"/>
      <property name="ABSLENGTH" ref="ABS_WATER"/>
    </material>
    <material name="steel">
      <D value="8.0" unit="g/cm3"/>
      <fraction n="1.0" ref="Fe"/>
    </material>
  </materials>
  <solids>
    <box name="world_s" lunit="mm" x="2000" y="2000" z="2000"/>
    <sphere name="tank_s" lunit="mm" aunit="deg" rmin="0" rmax="800"
            startphi="0" deltaphi="360" starttheta="0" deltatheta="180"/>
    <tube name="pmt_s" lunit="mm" aunit="deg" rmin="0" rmax="100"
          z="50" startphi="0" deltaphi="360"/>
    <box name="block_s" lunit="mm" x="200" y="200" z="200"/>
    <orb name="bore_s" lunit="mm" r="80"/>
    <subtraction name="holed_block_s">
      <first ref="block_s"/>
      <second ref="bore_s"/>
    </subtraction>
    <union name="snowman_s">
      <first ref="holed_block_s"/>
      <second ref="bore_s"/>
      <position name="headpos" unit="mm" x="0" y="0" z="-130"/>
      <rotation name="headrot" unit="deg" x="0" y="0" z="45"/>
    </union>
    <opticalsurface name="mirror" model="0" finish="1" type="0"
                    value="1.0">
      <property name="REFLECTIVITY" ref="REFL"/>
    </opticalsurface>
  </solids>
  <structure>
    <volume name="pmt_log">
      <materialref ref="steel"/>
      <solidref ref="pmt_s"/>
    </volume>
    <volume name="csg_log">
      <materialref ref="steel"/>
      <solidref ref="snowman_s"/>
    </volume>
    <volume name="tank_log">
      <materialref ref="water"/>
      <solidref ref="tank_s"/>
      <physvol name="csg_phys">
        <volumeref ref="csg_log"/>
        <position name="csgpos" unit="mm" x="0" y="400" z="0"/>
      </physvol>
      <physvol name="pmt_phys">
        <volumeref ref="pmt_log"/>
        <positionref ref="pmtpos"/>
        <rotationref ref="norot"/>
      </physvol>
    </volume>
    <volume name="world_log">
      <materialref ref="water"/>
      <solidref ref="world_s"/>
      <physvol name="tank_phys">
        <volumeref ref="tank_log"/>
      </physvol>
    </volume>
    <skinsurface name="mirror_skin" surfaceproperty="mirror">
      <volumeref ref="pmt_log"/>
    </skinsurface>
  </structure>
  <setup name="Default" version="1.0">
    <world ref="world_log"/>
  </setup>
</gdml>
""")


@pytest.fixture
def gdml_file(tmp_path):
    path = tmp_path / 'det.gdml'
    path.write_text(GDML)
    return str(path)


def classifier(volume_ref, material_ref, parent_material_ref):
    if 'pmt' in volume_ref:
        return 'pmt', dict(channel_type=1)
    if volume_ref == 'world_log':
        return 'omit', dict()
    return 'solid', dict()


def test_gdml_loads_hierarchy(gdml_file):
    loader = RATGeoLoader(gdml_file)
    assert loader.world.name == 'world_log'
    flat = loader.placement_to_volume_map
    assert '/BUILDROOT/tank_phys/pmt_phys' in flat
    pmt = flat['/BUILDROOT/tank_phys/pmt_phys']
    np.testing.assert_allclose(pmt.absolute_pos, [0, 0, 400])


def test_gdml_material_conversion(gdml_file):
    loader = RATGeoLoader(gdml_file)
    water = loader.materials_used[loader.material_lookup['water']]
    # 1.5e-6 MeV <-> ~827 nm ; 5e-6 MeV <-> ~248 nm
    wl = water.refractive_index[:, 0]
    assert wl.min() == pytest.approx(248, rel=0.01)
    assert wl.max() == pytest.approx(827, rel=0.01)
    # index increases toward short wavelengths
    assert water.refractive_index[0, 1] == pytest.approx(1.36)


def test_gdml_build_detector(gdml_file):
    loader = RATGeoLoader(gdml_file)
    det = loader.build_detector(volume_classifier=classifier)
    assert det.num_channels() == 1
    assert len(det.solids) == 3  # tank + pmt + csg block
    det.flatten()
    assert len(det.mesh.triangles) > 100
    # the PMT solid has the mirror skin surface applied
    pmt_solid = det.solids[det.channel_index_to_solid_id[0]]
    surfaces = set(pmt_solid.unique_surfaces)
    assert any(s is not None and s.name == 'mirror' for s in surfaces)


def test_ratdb_parser(tmp_path):
    entries = [
        {'name': 'GEO', 'index': 'pmts', 'valid_begin': 0,
         'valid_end': 0, 'type': 'pmtarray', 'pos_table': 'PMTINFO'},
        {'name': 'PMTINFO', 'index': '', 'valid_begin': 0, 'valid_end': 0,
         'x': [0.0], 'y': [0.0], 'z': [400.0], 'type': [1]},
        {'name': 'PMTINFO', 'index': '', 'valid_begin': -1,
         'valid_end': -1, 'type': [2]},
    ]
    path = tmp_path / 'db.json'
    path.write_text(json.dumps(entries))
    db = RatDBParser(str(path))
    entry = db.get_entry('PMTINFO', '')
    # user plane overrides the type but keeps default coords
    assert entry['type'] == [2]
    assert entry['z'] == [400.0]
    assert db.get_table('GEO')['pmts']['pos_table'] == 'PMTINFO'


def test_gdml_boolean_solids(gdml_file):
    """Subtraction/union solids mesh natively (BSP CSG) and flow
    end-to-end into a flattened detector (VERDICT round-1 #4)."""
    loader = RATGeoLoader(gdml_file)
    def vol_of(mesh):
        tv = mesh.vertices[mesh.triangles]
        return float(np.einsum('ij,ij->', tv[:, 0],
                               np.cross(tv[:, 1], tv[:, 2])) / 6.0)

    sphere = loader.build_mesh('bore_s')
    vol_sphere = vol_of(sphere)          # discretized, < analytic
    assert 0.9 * 4 / 3 * np.pi * 80 ** 3 < vol_sphere \
        < 4 / 3 * np.pi * 80 ** 3

    # bore fully inside the block: exact discrete volume difference
    mesh = loader.build_mesh('holed_block_s')
    vol = vol_of(mesh)
    assert abs(vol - (200.0 ** 3 - vol_sphere)) < 1e-3 * 200.0 ** 3

    # union head at z=-130: cap of height 50 submerged in the block
    mesh_u = loader.build_mesh('snowman_s')
    cap = np.pi * 50.0 ** 2 * (3 * 80.0 - 50.0) / 3.0
    expect = 200.0 ** 3 - vol_sphere + vol_sphere - cap
    assert abs(vol_of(mesh_u) - expect) < 0.02 * 200.0 ** 3

    det = loader.build_detector(volume_classifier=classifier)
    det.flatten()
    assert len(det.mesh.triangles) > 0


CONFORMAL_GDML = textwrap.dedent("""\
<?xml version="1.0" encoding="UTF-8" standalone="no" ?>
<gdml>
  <define>
    <matrix name="RI_WATER" coldim="2"
            values="1.5e-06 1.36 5.0e-06 1.4"/>
    <matrix name="REFL" coldim="2" values="1.5e-06 0.9 5.0e-06 0.9"/>
  </define>
  <materials>
    <material name="air">
      <D value="0.001" unit="g/cm3"/>
      <fraction n="1.0" ref="N2"/>
    </material>
    <material name="water">
      <D value="1.0" unit="g/cm3"/>
      <fraction n="1.0" ref="H2O"/>
      <property name="RINDEX" ref="RI_WATER"/>
    </material>
    <material name="steel">
      <D value="8.0" unit="g/cm3"/>
      <fraction n="1.0" ref="Fe"/>
    </material>
  </materials>
  <solids>
    <box name="world_s" lunit="mm" x="2000" y="2000" z="2000"/>
    <box name="tank_s" lunit="mm" x="400" y="400" z="400"/>
    <box name="lid_s" lunit="mm" x="400" y="400" z="200"/>
    <opticalsurface name="shiny" model="glisur" finish="polished"
                    type="dielectric_metal" value="1.0">
      <property name="REFLECTIVITY" ref="REFL"/>
    </opticalsurface>
  </solids>
  <structure>
    <volume name="lid_log">
      <materialref ref="steel"/>
      <solidref ref="lid_s"/>
    </volume>
    <volume name="tank_log">
      <materialref ref="water"/>
      <solidref ref="tank_s"/>
      <physvol name="lid_phys">
        <volumeref ref="lid_log"/>
        <position name="lidpos" unit="mm" x="0" y="0" z="100"/>
      </physvol>
    </volume>
    <volume name="world_log">
      <materialref ref="air"/>
      <solidref ref="world_s"/>
      <physvol name="tank_phys">
        <volumeref ref="tank_log"/>
      </physvol>
    </volume>
    <bordersurface name="lid_border" surfaceproperty="shiny">
      <physvolref ref="lid_phys"/>
      <physvolref ref="tank_phys"/>
    </bordersurface>
  </structure>
  <setup name="Default" version="1.0">
    <world ref="world_log"/>
  </setup>
</gdml>
""")


def test_conformal_shared_face(tmp_path):
    """A child volume flush against its parent's boundary: the shared
    face must appear exactly once, with inner=child material,
    outer=the medium beyond the parent, and the declared border
    surface applied (reference: chroma/rat/loader.py:370,:494
    conformal meshing + boundary analysis)."""
    path = tmp_path / 'conformal.gdml'
    path.write_text(CONFORMAL_GDML)
    loader = RATGeoLoader(str(path))

    def classify(volume_ref, material_ref, parent_material_ref):
        if volume_ref == 'world_log':
            return 'omit', dict()
        return 'solid', dict()

    det = loader.build_detector(volume_classifier=classify)
    solids = {s.inner_material[0].name: s for s in det.solids}
    tank, lid = solids['water'], solids['steel']

    # the tank lost its 4 top-face triangles to the dedup
    assert len(tank.mesh.triangles) == 12
    assert len(lid.mesh.triangles) == 16

    # the shared face (z = 200 plane) lives on the lid, seen once
    tri_z = lid.mesh.vertices[lid.mesh.triangles][:, :, 2]
    shared = np.all(np.isclose(tri_z, 200.0), axis=1)
    assert shared.sum() == 4
    for ti in np.nonzero(shared)[0]:
        assert lid.inner_material[ti].name == 'steel'
        assert lid.outer_material[ti].name == 'air'
        assert lid.surface[ti] is not None \
            and lid.surface[ti].name == 'shiny'
    # non-shared lid faces keep the normal nesting: outer = water,
    # border surface applied volume-wide (lid_phys <-> tank_phys)
    for ti in np.nonzero(~shared)[0]:
        assert lid.outer_material[ti].name == 'water'
        assert lid.surface[ti].name == 'shiny'
    # tank's remaining faces are untouched water/air
    assert all(m.name == 'air' for m in tank.outer_material)

    # no coincident duplicates anywhere after flatten
    det.flatten()
    tri = np.round(det.mesh.vertices[det.mesh.triangles] * 1e4)
    keys = {tuple(sorted(map(tuple, t))) for t in tri}
    assert len(keys) == len(det.mesh.triangles)


def test_conformal_disabled_keeps_duplicates(tmp_path):
    path = tmp_path / 'conformal.gdml'
    path.write_text(CONFORMAL_GDML)
    loader = RATGeoLoader(str(path))

    def classify(volume_ref, material_ref, parent_material_ref):
        if volume_ref == 'world_log':
            return 'omit', dict()
        return 'solid', dict()

    det = loader.build_detector(volume_classifier=classify,
                                conformal=False)
    counts = sorted(len(s.mesh.triangles) for s in det.solids)
    assert counts == [16, 16]
