"""The reference's literal ``casEN_opti2`` trusted-graph table, shipped.

Round-5 directive 4: the promotion operator (operators/consensus.py
``promote_trusted``) reproduced the reference's *semantics* on synthetic
combos, but the real 59-combo table (reference: src/config.yaml:269-446,
consumed at src/utils/ner_config.py:325 ``keep_precise_graphs``) was never
exercised against real data — so "how many mentions does casENOpti promote
on the reference corpus" had no regression pin. This module is that table,
verbatim, as ordered (grf_1, grf_2, grf_3) slot triples; "" is the
reference's intentionally-empty slot (which, under the as-run NaN quirk,
can never equal a *missing* grf — see promote_trusted's docstring).

tests/test_reference_golden.py pins the promoted-mention counts over the
committed 3,448-doc CasEN fixture under both reference variants.
"""

from __future__ import annotations

CASEN_OPTI2: list[tuple[str, str, str]] = [
    ('grfpersGenerique', '', ''),
    ('grforgProximite', '', ''),
    ('grfpersAmbigus', '', ''),
    ('grforgPolice', '', ''),
    ('grfplaceBatiment', '', ''),
    ('grfplaceQuartier', '', ''),
    ('grforgAdministrative', '', ''),
    ('grftoolPolylexicalOrgPlace', '', ''),
    ('grforgSport', '', ''),
    ('grforgEntreprise', '', ''),
    ('grfplaceRoutes', '', ''),
    ('grforgTransport', '', ''),
    ('grforgArmee', '', ''),
    ('grfGeogPlaceGenerique', '', ''),
    ('grforgPlaceGeoPolitique', '', ''),
    ('grforgMusique', '', ''),
    ('grforgJustice', '', ''),
    ('grforgFinance', '', ''),
    ('grfplace2org', '', ''),
    ('grforgAssemblee', '', ''),
    ('grftagOrgNameEntreprise', '', ''),
    ('grfgeogRiviere', '', ''),
    ('grforgSuiviDeParentheses', '', ''),
    ('grfadress', 'grftagZoneIndustrielle', ''),
    ('grfgeog', 'grftoolPolylexicalOrgPlace', ''),
    ('grfgeog', 'grforgPlaceGeoPolitique', ''),
    ('grfGeogPlaceGenerique', 'grfgeogRiviere', ''),
    ('grfGeogPlaceGenerique', 'grfgeogMer', ''),
    ('grfGeogPlaceGenerique', 'grfgeogPhysique', ''),
    ('grfGeogPlaceGenerique', 'grfgeogHydro', ''),
    ('grforgSeule', 'grfpersGenerique', ''),
    ('grforgSeule', 'grftagNomFamille', ''),
    ('grforgSeule', 'grfpersPrenomNom', ''),
    ('grforgSeule', 'grforgTransport', ''),
    ('grforgSeule', 'grforgGouvernement', ''),
    ('grforgSeule', 'grforgSport', ''),
    ('grforgSeule', 'grforgAssemblee', ''),
    ('grforgSeule', 'grfPartiPolitique', ''),
    ('grforgSeule', 'grftagGentileP', ''),
    ('grfpersCivilitePersonne', 'grftagNomFamille', ''),
    ('grfpersCivilitePersonne', 'grftagNomFamilleDe', ''),
    ('grfpersPrenomNom', 'grftagPrenom', 'grftagPrenom'),
    ('grfplace', 'grfplaceRoutes', ''),
    ('grfplace2org', 'grfgeog', ''),
    ('grfplaceRoutes', 'grfgeog', ''),
    ('grftagOrgFunder', 'grforgProximite', ''),
    ('grftagOrgNameEntreprise', 'grfpersPrenomNom', ''),
    ('grftagOrgNameEntreprise', 'grfpersGenerique', ''),
    ('grfadress', 'grftagZoneIndustrielle', 'grftagZoneIndustrielle'),
    ('grforgSeule', 'grforgArmee', 'grfpersPrenomNom'),
    ('grforgSeule', 'grforgAssemblee', 'grfpersGenerique'),
    ('grforgSeule', 'grftagGentileP', 'grftagNomFamille'),
    ('grforgSeule', 'grforgMusique', 'grfpersGenerique'),
    ('grforgSeule', 'grforgMusique', 'grfpersPrenomNom'),
    ('grfplace', 'grfplaceBatiment', 'grforgPolice'),
    ('grfplace', 'grfplaceBatiment', 'grforgProximite'),
    ('grfplace', 'grfplaceQuartier', 'grfpersGenerique'),
    ('grfplace', 'grfplaceBatiment', 'grforgEconomie'),
    ('grfplace', 'grfplaceBatiment', 'grfroleName'),
]
