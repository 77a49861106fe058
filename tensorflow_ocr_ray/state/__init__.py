"""Broadcast state: media stores and font-index sources for actor stages."""
