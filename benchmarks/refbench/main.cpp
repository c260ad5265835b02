/* Headless benchmark driver for the reference tracer core
 * (JCSaltFish/PBRPathTracer, /root/reference/PathTracing/src).
 *
 * Compiles pathtracer.cpp + mesh.cpp + image.cpp + pathutil.cpp with no
 * GL/GLFW/ImGui (see shim/GL/glew.h) and drives the same entry points the
 * app's render thread uses (main.cpp:3563-3618): LoadObject → SetMaterial →
 * BuildBVH → SetResolution/SetCamera/SetProjection → RenderFrame × spp.
 *
 * Input: a line-based scene spec (written by benchmarks/ref_baseline.py):
 *   obj <path>                       # LoadObject(path, identity)
 *   res <w> <h>
 *   depth <d>
 *   spp <n>
 *   camera <px py pz dx dy dz ux uy uz>
 *   projection <focal> <fovy>
 *   focal_dist <v>
 *   aperture <v>
 *   material <elem> <type> <dr dg db> <sr sg sb> <er eg eb> <eint> <rough>
 *            <refl> <transl> <ior>
 *   tex <slot> <elem> <path>         # slot: 0 diffuse .. 5 opacity
 *   out <path>                       # raw u8 RGB dump (w*h*3 bytes)
 *
 * Output: one JSON line on stdout with per-frame timing statistics.
 */
#include <chrono>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include <glm/glm.hpp>

#include "pathtracer.h"

static PathTracer gTracer;  /* static storage → mBvh zero-init, like the
                             * reference's global (main.cpp:62) */

int main(int argc, char** argv)
{
    if (argc < 2)
    {
        std::fprintf(stderr, "usage: %s <scene.spec>\n", argv[0]);
        return 2;
    }
    std::ifstream spec(argv[1]);
    if (!spec)
    {
        std::fprintf(stderr, "cannot open %s\n", argv[1]);
        return 2;
    }

    int w = 512, h = 512, depth = 4, spp = 1;
    glm::vec3 cpos(0.0f), cdir(0, 0, 1), cup(0, 1, 0);
    float focal = 0.1f, fovy = 90.0f, focalDist = 5.0f, aperture = 0.0f;
    std::string outPath;
    int nloaded = 0;

    std::string line;
    while (std::getline(spec, line))
    {
        std::istringstream ss(line);
        std::string tag;
        if (!(ss >> tag) || tag.empty() || tag[0] == '#')
            continue;
        if (tag == "obj")
        {
            std::string path;
            ss >> path;
            gTracer.LoadObject(path, glm::mat4(1.0f));
            nloaded++;
        }
        else if (tag == "res") ss >> w >> h;
        else if (tag == "depth") ss >> depth;
        else if (tag == "spp") ss >> spp;
        else if (tag == "camera")
            ss >> cpos.x >> cpos.y >> cpos.z >> cdir.x >> cdir.y >> cdir.z
               >> cup.x >> cup.y >> cup.z;
        else if (tag == "projection") ss >> focal >> fovy;
        else if (tag == "focal_dist") ss >> focalDist;
        else if (tag == "aperture") ss >> aperture;
        else if (tag == "material")
        {
            int elem, type;
            Material m;
            ss >> elem >> type
               >> m.diffuse.r >> m.diffuse.g >> m.diffuse.b
               >> m.specular.r >> m.specular.g >> m.specular.b
               >> m.emissive.r >> m.emissive.g >> m.emissive.b
               >> m.emissiveIntensity >> m.roughness >> m.reflectiveness
               >> m.translucency >> m.ior;
            m.type = type ? MaterialType::TRANSLUCENT : MaterialType::OPAQUE;
            gTracer.SetMaterial(0, elem, m);
        }
        else if (tag == "tex")
        {
            int slot, elem;
            std::string path;
            ss >> slot >> elem >> path;
            switch (slot)
            {
            case 0: gTracer.SetDiffuseTextureForElement(0, elem, path); break;
            case 1: gTracer.SetNormalTextureForElement(0, elem, path); break;
            case 2: gTracer.SetEmissTextureForElement(0, elem, path); break;
            case 3: gTracer.SetRoughnessTextureForElement(0, elem, path); break;
            case 4: gTracer.SetMetallicTextureForElement(0, elem, path); break;
            case 5: gTracer.SetOpacityTextureForElement(0, elem, path); break;
            }
        }
        else if (tag == "out") ss >> outPath;
    }
    if (!nloaded)
    {
        std::fprintf(stderr, "no obj loaded\n");
        return 2;
    }

    gTracer.SetTraceDepth(depth);
    gTracer.SetResolution(glm::ivec2(w, h));
    std::vector<GLubyte> outImg((size_t)w * h * 3, 0);
    gTracer.SetOutImage(outImg.data());
    gTracer.SetCamera(cpos, cdir, cup);
    gTracer.SetProjection(focal, fovy);
    gTracer.SetCameraFocalDist(focalDist);
    gTracer.SetCameraAperture(aperture);

    auto t0 = std::chrono::steady_clock::now();
    gTracer.BuildBVH();
    auto t1 = std::chrono::steady_clock::now();
    double bvhS = std::chrono::duration<double>(t1 - t0).count();

    gTracer.ResetImage();
    double firstS = 0.0, totalS = 0.0;
    for (int s = 0; s < spp; s++)
    {
        auto f0 = std::chrono::steady_clock::now();
        gTracer.RenderFrame();
        auto f1 = std::chrono::steady_clock::now();
        double dt = std::chrono::duration<double>(f1 - f0).count();
        totalS += dt;
        if (s == 0)
            firstS = dt;
    }

    if (!outPath.empty())
    {
        std::ofstream out(outPath, std::ios::binary);
        out.write((const char*)outImg.data(), (std::streamsize)outImg.size());
    }

    double pathsPerS = (double)w * h * spp / totalS;
    std::printf(
        "{\"triangles\": %d, \"samples\": %d, \"bvh_build_s\": %.6f, "
        "\"t_first_frame_s\": %.6f, \"t_total_s\": %.6f, "
        "\"t_per_sample_s\": %.6f, \"paths_per_s\": %.1f, "
        "\"res\": [%d, %d], \"depth\": %d}\n",
        gTracer.GetTriangleCount(), gTracer.GetSamples(), bvhS, firstS,
        totalS, totalS / spp, pathsPerS, w, h, depth);
    return 0;
}
