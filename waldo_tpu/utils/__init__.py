from .shapes import flatten, unflatten, flatten_vid, unflatten_vid, gather_time
