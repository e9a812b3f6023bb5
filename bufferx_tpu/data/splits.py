"""Benchmark split definitions (sequence/scene identifiers).

Factual sequence lists for the 13 evaluation targets, equivalent to the
reference's ``config/splits/*.txt``. Loaders fall back to directory
discovery when a listed sequence is absent.
"""

KITTI = {
    "train": ["0", "1", "2", "3", "4", "5"],
    "val": ["6", "7"],
    "test": ["8", "9", "10"],
}

WOD_TEST = [
    "17792628511034220885_2360_000_2380_000",
    "18149616047892103767_2460_000_2480_000",
    "10980133015080705026_780_000_800_000",
    "2601205676330128831_4880_000_4900_000",
    "7247823803417339098_2320_000_2340_000",
    "14188689528137485670_2660_000_2680_000",
    "5026942594071056992_3120_000_3140_000",
    "5638240639308158118_4220_000_4240_000",
    "8688567562597583972_940_000_960_000",
    "4140965781175793864_460_000_480_000",
    "15272375112495403395_620_000_640_000",
    "11987368976578218644_1340_000_1360_000",
    "10504764403039842352_460_000_480_000",
    "8993680275027614595_2520_000_2540_000",
    "17136775999940024630_4860_000_4880_000",
    "14737335824319407706_1980_000_2000_000",
]

MIT_TEST = ["acl_jackal"]

OXFORD_TEST = [
    "01_short_experiments",
    "05_quad_with_dynamics",
    "07_parkland_mound",
]

KAIST_TEST = ["Avia", "Aeva", "Ouster"]

TIERS_TEST = ["tiers_indoor06", "tiers_indoor08", "tiers_indoor09"]

THREEDMATCH_TEST_SCENES = [
    "7-scenes-redkitchen",
    "sun3d-home_at-home_at_scan1_2013_jan_1",
    "sun3d-home_md-home_md_scan9_2012_sep_30",
    "sun3d-hotel_uc-scan3",
    "sun3d-hotel_umd-maryland_hotel1",
    "sun3d-hotel_umd-maryland_hotel3",
    "sun3d-mit_76_studyroom-76-1studyroom2",
    "sun3d-mit_lab_hj-lab_hj_tea_nov_2_2012_scan1_erika",
]

ETH_TEST_SCENES = [
    "gazebo_summer",
    "gazebo_winter",
    "wood_autmn",
    "wood_summer",
]
