"""Pipeline options — parity with the reference's typed option set.

Defaults pinned from /root/reference/Options.cs:269-309 and the derived
spacing rule diffmedium = MediumFactor*MinorDistance,
diffmajor = MajorFactor*MediumFactor*MinorDistance
(/root/reference/Program.cs:429-431).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ContourOptions:
    """Parameters of the contour pipeline (Options.cs:269-309)."""

    minor_distance: int = 20          # Options.cs:282  (MinorDistance)
    medium_factor: int = 5            # Options.cs:283  (MediumFactor)
    major_factor: int = 5             # Options.cs:284  (MajorFactor)
    min_vertice_points: int = 3       # Options.cs:278  (MinVerticePoints)
    min_bounding_box: float = 0.0005  # Options.cs:279  (MinBoundingbox)
    douglas_peucker: float = 0.04     # Options.cs:280  (DouglasPeucker)
    max_nodes_per_way: int = 500      # Options.cs:286  (MaxNodesPerWay)
    fake_distance: float = -0.5       # Options.cs:304  (FakeDistance)
    write_elevation_type: bool = True # Options.cs:285  (WriteElevationType)

    @property
    def diff_medium(self) -> int:
        return self.medium_factor * self.minor_distance  # Program.cs:430

    @property
    def diff_major(self) -> int:
        return self.major_factor * self.medium_factor * self.minor_distance  # Program.cs:431


#: README invocation profile (/root/reference/README.md:6)
README_PROFILE = ContourOptions(
    fake_distance=-0.5,
    min_vertice_points=3,
    min_bounding_box=0.00016,
    douglas_peucker=0.12,
    write_elevation_type=False,
)


def tile_first_id(lat: int, lon: int) -> int:
    """Deterministic per-tile 64-bit ID base.

    FirstID = (1000*(lat+90) + lon+180) * 10^10 (Program.cs:95-98).
    Tile-keyed bases keep multi-tile ID streams disjoint (SURVEY.md Q5).
    """
    return (1000 * (lat + 90) + lon + 180) * 10_000_000_000
