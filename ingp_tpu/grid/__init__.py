from .occupancy import (
    grid_init,
    mark_invisible_cells,
    update_density_grid,
    all_cell_coords,
)
