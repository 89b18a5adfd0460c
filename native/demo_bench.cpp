/*
 * demo_bench: headless baseline measurement of the reference engine on
 * the demo scenes (demo03 is the designated benchmark scene,
 * VERSION:166-167).
 *
 * The reference's RooT app only benches demos through an X11 window;
 * this standalone driver links the engine exactly like the reference's
 * own core_test build (test/core_make_x64.mk source list + flags) and
 * renders scn_demo01..03 offscreen with the same serial
 * thread-simulation path core_test uses (engine.cpp:429-506), i.e. the
 * same configuration golden/baseline_ref.json's test-scene numbers were
 * measured with. Synthetic frame time advances 16 ms/frame (RooT's
 * -f/-i deterministic mode, RooT.h:595).
 *
 * Also dumps the t=0 frame of each demo as a BMP golden
 * (ref_demoNN.bmp) for cross-validation of the TPU renderer.
 *
 * Usage: demo_bench [frames] [outdir]
 */

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>

#include "rtbase.h"
#include "format.h"
#include "engine.h"

#include "scn_demo01.h"
#include "scn_demo02.h"
#include "scn_demo03.h"

/* ---- system hooks (the pattern every reference app implements) ---- */

#include <sys/time.h>
#include <sys/mman.h>

static rt_time get_time_ms()
{
    timeval tm;
    gettimeofday(&tm, NULL);
    return (rt_time)(tm.tv_sec * 1000 + tm.tv_usec / 1000);
}

static rt_pntr sys_alloc(rt_size size)
{
    rt_pntr ptr = mmap(NULL, size, PROT_READ | PROT_WRITE,
                       MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
    if (ptr == MAP_FAILED)
    {
        throw rt_Exception("alloc failed in sys_alloc");
    }
    return ptr;
}

static rt_void sys_free(rt_pntr ptr, rt_size size)
{
    munmap(ptr, size);
}

/* ---- minimal 24-bit BMP writer for the golden dumps ---- */

static void put32(FILE *f, uint32_t v)
{
    fputc(v & 255, f); fputc((v >> 8) & 255, f);
    fputc((v >> 16) & 255, f); fputc((v >> 24) & 255, f);
}

static void save_bmp(const char *path, const rt_ui32 *frame,
                     int w, int h, int row)
{
    FILE *f = fopen(path, "wb");
    if (f == NULL) { fprintf(stderr, "cannot write %s\n", path); return; }
    int pad = (4 - (w * 3) % 4) % 4;
    uint32_t img = (w * 3 + pad) * h;
    fputc('B', f); fputc('M', f);
    put32(f, 54 + img); put32(f, 0); put32(f, 54);
    put32(f, 40); put32(f, w); put32(f, h);
    fputc(1, f); fputc(0, f); fputc(24, f); fputc(0, f);
    put32(f, 0); put32(f, img); put32(f, 2835); put32(f, 2835);
    put32(f, 0); put32(f, 0);
    for (int y = h - 1; y >= 0; y--)
    {
        for (int x = 0; x < w; x++)
        {
            rt_ui32 px = frame[y * row + x];
            fputc(px & 255, f); fputc((px >> 8) & 255, f);
            fputc((px >> 16) & 255, f);
        }
        for (int p = 0; p < pad; p++) fputc(0, f);
    }
    fclose(f);
}

/* ---- driver ---- */

static const int X_RES = 800;
static const int Y_RES = 480;

int main(int argc, char *argv[])
{
    int frames = argc > 1 ? atoi(argv[1]) : 30;
    const char *outdir = argc > 2 ? argv[2] : ".";

    rt_SCENE *defs[] = { &scn_demo01::sc_root,
                         &scn_demo02::sc_root,
                         &scn_demo03::sc_root };
    const char *names[] = { "demo01", "demo02", "demo03" };

    rt_si32 x_row = (X_RES + RT_SIMD_WIDTH - 1) & ~(RT_SIMD_WIDTH - 1);
    rt_Platform pfm(sys_alloc, sys_free);

    printf("{\n  \"frames\": %d,\n  \"resolution\": [%d, %d],\n"
           "  \"time_step_ms\": 16,\n  \"ms_per_frame\": {\n",
           frames, X_RES, Y_RES);

    for (int d = 0; d < 3; d++)
    {
        rt_Scene *scene;
        try
        {
            scene = new(&pfm) rt_Scene(defs[d], X_RES, Y_RES, x_row,
                                       RT_NULL, &pfm);
        }
        catch (rt_Exception e)
        {
            fprintf(stderr, "%s: scene init failed: %s\n", names[d], e.err);
            continue;
        }
        /* t=0 golden frame */
        scene->render(0);
        char path[512];
        snprintf(path, sizeof(path), "%s/ref_%s.bmp", outdir, names[d]);
        save_bmp(path, (const rt_ui32 *)scene->get_frame(),
                 X_RES, Y_RES, x_row);

        /* timed animated frames (Time F methodology, core_test.cpp:
         * 998-1007: continuous loop wall clock / frame count) */
        rt_time t0 = get_time_ms();
        for (int i = 1; i <= frames; i++)
        {
            scene->render(16 * i);
        }
        rt_time dt = get_time_ms() - t0;
        printf("    \"%s\": %.3f%s\n", names[d], (double)dt / frames,
               d < 2 ? "," : "");
        fflush(stdout);
        delete scene;
    }
    printf("  }\n}\n");
    return 0;
}
