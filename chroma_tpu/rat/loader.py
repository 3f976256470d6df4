"""GDML -> Detector loader (parity subset of chroma/rat/loader.py).

Parses a GDML file directly (xml.etree), builds the volume hierarchy
with absolute placements, meshes each volume's solid with the native
primitive generators (chroma_tpu/rat/gdml.py) and assembles a Detector.

Architectural difference vs the reference: the reference pushes every
solid through the gmsh OCC kernel and conformally meshes shared
boundaries, assigning per-face materials from boundary analysis
(reference: chroma/rat/loader.py:370 retrieve_mesh, :494
assign_surface_properties).  Here each volume is meshed
independently (triangles get inner=volume material / outer=parent
material — the classic Chroma geometry model), then a conformal
pass detects triangles coincident between touching volumes (the
native meshers tessellate matching profiles identically), keeps each
shared face exactly once on the deepest volume with outer material
taken from the far side, and applies GDML border surfaces
(``bordersurface``) both to whole child/parent interfaces and to
deduplicated shared faces.  Boolean solids use the native BSP CSG.
"""
from collections import deque

import numpy as np
import xml.etree.ElementTree as et

from chroma_tpu.rat import gdml
from chroma_tpu.geometry import Mesh, Solid, vacuum
from chroma_tpu.detector import Detector
from chroma_tpu.transform import make_rotation_matrix
from chroma_tpu.log import logger

DEFAULT_SOLID_COLOR = 0xEEA0A0A0
DEFAULT_PMT_COLOR = 0xA0A05000


def _default_volume_classifier(volume_ref, material_ref,
                               parent_material_ref):
    """Example classifier: ('pmt'|'solid'|'omit', Solid kwargs)."""
    if 'OpDetSensitive' in volume_ref:
        return 'pmt', dict(color=DEFAULT_PMT_COLOR, surface=None,
                           channel_type=0)
    elif material_ref == parent_material_ref:
        return 'omit', dict()
    else:
        return 'solid', dict(color=DEFAULT_SOLID_COLOR, surface=None)


class Volume:
    """A GDML logical volume placement with absolute transform."""

    def __init__(self, name, loader, phys_vol_name='/BUILDROOT',
                 parent_material_ref=None, absolute_pos=None,
                 absolute_rot=None):
        self.placementName = phys_vol_name
        self.name = name
        elem = loader.vol_xml_map[name]
        self.material_ref = elem.find('materialref').get('ref')
        self.parent_material_ref = parent_material_ref
        self.solid_ref = elem.find('solidref').get('ref')
        self.mesh = None
        self.pmt_type = None
        self.pmt_channel = None
        self.absolute_pos = np.zeros(3) if absolute_pos is None \
            else np.asarray(absolute_pos, dtype=float)
        self.absolute_rot = np.identity(3) if absolute_rot is None \
            else np.asarray(absolute_rot, dtype=float)

        self.children = []
        for placement in elem.findall('physvol'):
            c_pos, c_rot = loader.get_pos_rot(placement)
            c_pos = gdml.get_vals(c_pos) if c_pos is not None \
                else np.zeros(3)
            angles = gdml.get_vals(c_rot) if c_rot is not None \
                else np.zeros(3)
            c_pos = (self.absolute_rot @ c_pos) + self.absolute_pos
            x_rot = make_rotation_matrix(angles[0], [1, 0, 0])
            y_rot = make_rotation_matrix(angles[1], [0, 1, 0])
            z_rot = make_rotation_matrix(angles[2], [0, 0, 1])
            c_rot = self.absolute_rot @ x_rot @ y_rot @ z_rot
            self.children.append(Volume(
                placement.find('volumeref').get('ref'), loader,
                self.placementName + '/' + str(placement.get('name')),
                parent_material_ref=self.material_ref,
                absolute_pos=c_pos, absolute_rot=c_rot))

    def show_hierarchy(self, indent=''):
        print(indent + str(self), self.solid_ref, self.material_ref)
        for child in self.children:
            child.show_hierarchy(indent=indent + ' ')

    def flat_view(self):
        placement_map = {self.placementName: self}
        for volume in self.children:
            placement_map.update(volume.flat_view())
        return placement_map

    def __str__(self):
        return self.name

    __repr__ = __str__


class RATGeoLoader:
    """Builds a chroma_tpu Detector from a GDML file (+ optional
    RATDB channel info)."""

    def __init__(self, gdml_file, refinement_order=0, ratdb_file=None,
                 override_worldref=None, outside_material_ref=None):
        self.nPMTs = 0
        self.pmt_index_to_position = None
        self.pmt_index_to_type = None
        self.ratdb_parser = None
        if ratdb_file is not None:
            self.add_ratdb(ratdb_file)
        else:
            logger.warning('No RATDB file provided; no PMT channel info '
                           'will be loaded.')

        self.refinement_order = refinement_order
        self.gdml_file = gdml_file
        gdml_tree = et.parse(gdml_file).getroot()

        define = gdml_tree.find('define')
        self.pos_map = {p.get('name'): p for p in
                        define.findall('position')}
        self.rot_map = {r.get('name'): r for r in
                        define.findall('rotation')}
        self.matrix_map = {m.get('name'): m for m in
                           define.findall('matrix')}
        self.vertex_positions = {
            v.get('name'): gdml.get_vals(v, unit_attr='unit')
            for v in define.findall('position')}

        self.materials_used = []
        self.material_lookup = {}
        for material_xml in gdml_tree.find('materials'):
            if material_xml.tag != 'material':
                continue
            self.materials_used.append(
                gdml.create_material(self.matrix_map, material_xml))
            self.material_lookup[material_xml.get('name')] = \
                len(self.materials_used) - 1

        solids = gdml_tree.find('solids')
        self.solid_xml_map = {s.get('name'): s for s in solids}
        self.surfaces_used = [None]
        self.surface_lookup = {None: None}
        for surface_xml in solids.findall('opticalsurface'):
            surface = gdml.create_surface(self.matrix_map, surface_xml)
            self.surfaces_used.append(surface)
            self.surface_lookup[surface_xml.get('name')] = surface

        structure = gdml_tree.find('structure')
        volumes = structure.findall('volume')
        self.vol_xml_map = {v.get('name'): v for v in volumes}

        # skin surfaces: surface applied to all faces of a volume
        self.skin_surface_map = {}
        for skin in structure.findall('skinsurface'):
            vol_ref = skin.find('volumeref').get('ref')
            self.skin_surface_map[vol_ref] = \
                self.surface_lookup.get(skin.get('surfaceproperty'))

        # border surfaces: surface applied to photons crossing between a
        # specific pair of physical volumes (reference:
        # chroma/rat/loader.py:537 border_surfaces matching)
        self.border_surfaces = []
        for border in structure.findall('bordersurface'):
            pv_refs = [pv.get('ref')
                       for pv in border.findall('physvolref')]
            surface = self.surface_lookup.get(
                border.get('surfaceproperty'))
            if len(pv_refs) == 2 and surface is not None:
                self.border_surfaces.append(
                    {'placement_names': frozenset(pv_refs),
                     'surface': surface})

        world_ref = gdml_tree.find('setup').find('world').get('ref')
        if override_worldref is not None:
            world_ref = override_worldref
        self.world = Volume(world_ref, self)
        self.placement_to_volume_map = self.world.flat_view()
        self.outside_material_ref = outside_material_ref
        self.solidsToIgnore = lambda _: False

    # ------------------------------------------------------------------

    def add_ratdb(self, ratdb_file):
        from chroma_tpu.rat.ratdb_parser import RatDBParser
        self.ratdb_parser = RatDBParser(ratdb_file)

    def get_pos_rot(self, elem, refs=('position', 'rotation')):
        pos_ref, rot_ref = refs
        pos = elem.find(pos_ref)
        if pos is None:
            pos = elem.find(pos_ref + 'ref')
            if pos is not None:
                pos = self.pos_map[pos.get('ref')]
        rot = elem.find(rot_ref)
        if rot is None:
            rot = elem.find(rot_ref + 'ref')
            if rot is not None:
                rot = self.rot_map[rot.get('ref')]
        return pos, rot

    def _boolean_mesh(self, elem, op):
        """Boolean solid via native BSP CSG (chroma_tpu/csg.py; the
        reference routes these through gmsh/OCC — rat/gen_mesh.py:56).
        The GDML transform applies to the second solid."""
        from chroma_tpu import csg
        from chroma_tpu.geometry import Mesh

        first = self.build_mesh(elem.find('first').get('ref'))
        second = self.build_mesh(elem.find('second').get('ref'))
        if first is None or second is None:
            return first if second is None else second

        def placed(mesh, pos, rot):
            verts = mesh.vertices
            if rot is not None:
                angles = gdml.get_vals(rot)
                x_rot = make_rotation_matrix(angles[0], [1, 0, 0])
                y_rot = make_rotation_matrix(angles[1], [0, 1, 0])
                z_rot = make_rotation_matrix(angles[2], [0, 0, 1])
                verts = np.inner(verts, x_rot @ y_rot @ z_rot)
            if pos is not None:
                verts = verts + np.asarray(gdml.get_vals(pos),
                                           dtype=float)
            if verts is mesh.vertices:
                return mesh
            return Mesh(verts, mesh.triangles,
                        remove_duplicate_vertices=False,
                        remove_null_triangles=False)

        fpos, frot = self.get_pos_rot(
            elem, refs=('firstposition', 'firstrotation'))
        first = placed(first, fpos, frot)
        pos, rot = self.get_pos_rot(elem)
        second = placed(second, pos, rot)
        return csg.boolean(op, first, second)

    def build_mesh(self, solid_ref):
        """Mesh for the named solid (primitives native; boolean solids
        via chroma_tpu.csg)."""
        if self.solidsToIgnore(solid_ref):
            logger.info('Ignoring solid: %s', solid_ref)
            return None
        elem = self.solid_xml_map[solid_ref]
        mesh_type = elem.tag
        if mesh_type in ('union', 'subtraction', 'intersection'):
            return self._boolean_mesh(elem, mesh_type)
        dispatcher = {
            'box': gdml.box,
            'eltube': gdml.eltube,
            'ellipsoid': gdml.ellipsoid,
            'orb': gdml.orb,
            'polycone': gdml.polycone,
            'polyhedra': gdml.polyhedra,
            'sphere': gdml.sphere,
            'torus': gdml.torus,
            'tube': gdml.tube,
            'tessellated': lambda el: gdml.tessellated(
                el, self.vertex_positions),
            'torusstack': gdml.torusstack,
            'opticalsurface': gdml.ignore,
        }
        generator = dispatcher.get(mesh_type, gdml.notImplemented)
        return generator(elem)

    def _border_surface_for(self, pv_a, pv_b):
        """Border surface declared between two physical volume names."""
        pair = frozenset((pv_a, pv_b))
        for border in self.border_surfaces:
            if border['placement_names'] == pair:
                return border['surface']
        return None

    @staticmethod
    def _pv_name(placement):
        return placement.rsplit('/', 1)[-1]

    def build_detector(self, detector=None,
                       volume_classifier=_default_volume_classifier,
                       solids_to_ignore=None, no_union=None,
                       conformal=True):
        """Assemble a Detector from the volume hierarchy.

        With ``conformal=True`` (default), triangles coincident between
        touching volumes are deduplicated: each shared face is kept once
        on the deepest volume, its outer material is the far side's
        outer material, and declared ``bordersurface`` properties are
        applied (reference: chroma/rat/loader.py:494
        assign_surface_properties via gmsh conformal meshing).
        """
        if detector is None:
            detector = Detector(vacuum)
        if solids_to_ignore is not None:
            self.solidsToIgnore = solids_to_ignore

        records = []
        q = deque([self.world])
        while q:
            volume = q.pop()
            q.extend(volume.children)
            classification, kwargs = volume_classifier(
                volume.name, volume.material_ref,
                volume.parent_material_ref)
            if classification == 'omit':
                continue
            mesh = self.build_mesh(volume.solid_ref)
            if mesh is None:
                continue
            mesh.vertices = np.inner(mesh.vertices,
                                     volume.absolute_rot) \
                + volume.absolute_pos
            volume.mesh = mesh

            inner = self.materials_used[
                self.material_lookup[volume.material_ref]]
            outer_ref = volume.parent_material_ref
            if outer_ref is None:
                outer_ref = self.outside_material_ref \
                    or volume.material_ref
            outer = self.materials_used[self.material_lookup[outer_ref]]

            surface = kwargs.pop('surface', None)
            if surface is None:
                surface = self.skin_surface_map.get(volume.name)
            if surface is None and '/' in volume.placementName[1:]:
                # whole child/parent interface border surface
                parent_placement = volume.placementName.rsplit('/', 1)[0]
                surface = self._border_surface_for(
                    self._pv_name(volume.placementName),
                    self._pv_name(parent_placement))
            color = kwargs.pop('color', DEFAULT_SOLID_COLOR)
            channel_type = kwargs.pop('channel_type', None)
            kwargs.pop('material1', None)
            kwargs.pop('material2', None)

            solid = Solid(mesh, inner, outer, surface=surface,
                          color=color)
            if classification == 'pmt' and volume.pmt_channel is not None:
                channel_type = volume.pmt_type
            records.append({'volume': volume, 'solid': solid,
                            'classification': classification,
                            'channel_type': channel_type})

        if conformal and len(records) > 1:
            self._conform(records)

        for rec in records:
            if rec['classification'] == 'pmt':
                detector.add_pmt(rec['solid'],
                                 channel_type=rec['channel_type'],
                                 displacement=None)
            elif rec['classification'] == 'solid':
                detector.add_solid(rec['solid'])
            else:
                raise Exception('Unknown volume classification: %r'
                                % rec['classification'])
        return detector

    def _conform(self, records):
        """Deduplicate coincident triangles between touching volumes.

        Triangles whose three vertices agree to 0.1 um across two (or
        more) volumes are a shared boundary meshed twice.  Keep the
        deepest volume's copy, give it the shallowest volume's outer
        material (the medium actually on the far side), and resolve its
        surface as: declared border surface between the two placements,
        else the kept triangle's surface, else any dropped triangle's
        surface (e.g. the parent's skin).  Mirrors the boundary
        analysis of the reference's conformal gmsh pipeline
        (chroma/rat/loader.py:370,:494) without an OCC kernel.
        """
        vert_dt = np.dtype([('x', 'i8'), ('y', 'i8'), ('z', 'i8')])
        tri_dt = np.dtype([('a', vert_dt), ('b', vert_dt),
                           ('c', vert_dt)])
        all_keys = []
        owner = []
        for ri, rec in enumerate(records):
            mesh = rec['solid'].mesh
            ntri = len(mesh.triangles)
            verts = mesh.vertices[mesh.triangles]  # (n, 3, 3)
            qv = np.ascontiguousarray(
                np.round(verts * 1e4).astype(np.int64)
            ).view(vert_dt).reshape(ntri, 3)
            qv.sort(axis=1)
            all_keys.append(qv.view(tri_dt).reshape(ntri))
            owner.append(np.stack(
                [np.full(ntri, ri), np.arange(ntri)], axis=1))
        keys = np.concatenate(all_keys)
        owner = np.concatenate(owner)
        _, inverse, counts = np.unique(keys, return_inverse=True,
                                       return_counts=True)
        dup_groups = {}
        for flat_idx in np.nonzero(counts[inverse] >= 2)[0]:
            dup_groups.setdefault(inverse[flat_idx], []).append(
                tuple(owner[flat_idx]))

        drop = [np.zeros(len(k), dtype=bool) for k in all_keys]
        n_shared = 0
        for entries in dup_groups.values():
            if len({ri for ri, _ in entries}) < 2:
                continue  # duplicate within one solid: leave alone
            n_shared += 1
            depth = [records[ri]['volume'].placementName.count('/')
                     for ri, _ in entries]
            order = np.argsort(depth)[::-1]
            keep_ri, keep_ti = entries[order[0]]
            far_ri, far_ti = entries[order[-1]]
            keep_solid = records[keep_ri]['solid']
            keep_solid.outer_material[keep_ti] = \
                records[far_ri]['solid'].outer_material[far_ti]
            surface = None
            keep_pv = self._pv_name(
                records[keep_ri]['volume'].placementName)
            for oi in order[1:]:
                ri, ti = entries[oi]
                drop[ri][ti] = True
                if surface is None:
                    surface = self._border_surface_for(
                        keep_pv, self._pv_name(
                            records[ri]['volume'].placementName))
            if surface is None and keep_solid.surface[keep_ti] is not None:
                surface = keep_solid.surface[keep_ti]
            if surface is None:
                for oi in order[1:]:
                    ri, ti = entries[oi]
                    s = records[ri]['solid'].surface[ti]
                    if s is not None:
                        surface = s
                        break
            keep_solid.surface[keep_ti] = surface

        if n_shared:
            logger.info('conformal pass: %d shared faces deduplicated',
                        n_shared)
        for rec, mask in zip(records, drop):
            if not mask.any():
                continue
            solid = rec['solid']
            keep = ~mask
            solid.mesh = Mesh(solid.mesh.vertices,
                              solid.mesh.triangles[keep],
                              remove_duplicate_vertices=False,
                              remove_null_triangles=False)
            for field in ('inner_material', 'outer_material',
                          'surface', 'color'):
                setattr(solid, field, getattr(solid, field)[keep])
        from chroma_tpu.geometry import _unique_objects
        for rec in records:
            solid = rec['solid']
            solid.unique_materials = _unique_objects(
                list(solid.inner_material) + list(solid.outer_material))
            solid.unique_surfaces = _unique_objects(list(solid.surface))

    def add_pmt_info(self):
        """Assign PMT channels/types from RATDB GEO pmtarray tables."""
        assert self.ratdb_parser is not None, 'no RATDB loaded'
        pmt_arrays = [e for e in self.ratdb_parser.entries
                      if e.get('name') == 'GEO'
                      and e.get('type') == 'pmtarray']
        pmt_volume_names = [t['index'] + '_body_log' for t in pmt_arrays]
        pmtinfo_tables = [self.ratdb_parser.get_entry(t['pos_table'], '')
                          for t in pmt_arrays]
        pmt_positions = [np.array([t['x'], t['y'], t['z']]).T
                         for t in pmtinfo_tables]
        pmt_types = [t['type'] for t in pmtinfo_tables]

        self.nPMTs = 0
        self.pmt_index_to_type = []
        self.pmt_index_to_position = []
        for placement, volume in self.placement_to_volume_map.items():
            for ai, vol_name in enumerate(pmt_volume_names):
                if not volume.name.startswith(vol_name):
                    continue
                idx = np.argwhere(np.all(np.isclose(
                    volume.absolute_pos, pmt_positions[ai]), axis=1))
                assert idx.size == 1, \
                    'PMT %s not found or not unique' % volume.name
                idx = idx.item()
                volume.pmt_type = pmt_types[ai][idx]
                volume.pmt_channel = self.nPMTs
                self.pmt_index_to_type.append(volume.pmt_type)
                self.pmt_index_to_position.append(pmt_positions[ai][idx])
                self.nPMTs += 1
                break
        logger.info('Assigned %d PMT channels', self.nPMTs)

    def visualize(self, **kwargs):
        from chroma_tpu.camera import view
        return view(self.build_detector(), **kwargs)
