"""Pipeline catalog exposed through ``__ray_entry__``."""
