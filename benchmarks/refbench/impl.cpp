/* Third-party single-header implementations for the headless reference
 * build. The reference app defines these in main.cpp:3-5 (which we do not
 * compile — it needs GLFW/ImGui); image.cpp defines the stb_image_resize
 * implementation itself. */
#define STB_IMAGE_IMPLEMENTATION
#include <stb_image.h>
#define TINYOBJLOADER_IMPLEMENTATION
#include <tiny_obj_loader.h>
