from .composite_pallas import composite_pallas, pallas_supported
