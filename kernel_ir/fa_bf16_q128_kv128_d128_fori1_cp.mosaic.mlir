module @_fori_entry {
  func.func @main(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, %arg4: memref<1x4x2048x128xbf16, #tpu.memory_space<any>>, %arg5: memref<1x4x2048x128xbf16, #tpu.memory_space<any>>, %arg6: memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, %arg7: memref<1x128x128xbf16, #tpu.memory_space<vmem>>, %arg8: memref<1x128x128xbf16, #tpu.memory_space<vmem>>, %arg9: memref<2x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) attributes {dimension_semantics = [#tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>], iteration_bounds = array<i64: 1, 4, 16>, scalar_prefetch = 0 : i64, scratch_operands = 3 : i64, window_params = [{transform_indices = @transform_0, window_bounds = array<i64: 1, 1, 128, 128>}, {}, {}, {transform_indices = @transform_3, window_bounds = array<i64: 1, 1, 128, 128>}]} {
    %cst = arith.constant dense<0.0883883461> : vector<128x128xf32>
    %c16_i32 = arith.constant 16 : i32
    %cst_0 = arith.constant dense<-1.000000e+30> : vector<128x128xf32>
    %cst_1 = arith.constant dense<0.000000e+00> : vector<128xf32>
    %cst_2 = arith.constant dense<0xFF800000> : vector<128xf32>
    %cst_3 = arith.constant dense<0.000000e+00> : vector<128x128xf32>
    %c1_i32 = arith.constant 1 : i32
    %c0 = arith.constant 0 : index
    %c0_i32 = arith.constant 0 : i32
    %c128_i32 = arith.constant 128 : i32
    %0 = vector.load %arg3[%c0, %c0, %c0, %c0] : memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x128x128xbf16>
    %1 = vector.shape_cast %0 : vector<1x1x128x128xbf16> to vector<128x128xbf16>
    %2:3 = scf.for %arg10 = %c0_i32 to %c16_i32 step %c1_i32 iter_args(%arg11 = %cst_0, %arg12 = %cst_3, %arg13 = %cst_3) -> (vector<128x128xf32>, vector<128x128xf32>, vector<128x128xf32>)  : i32 {
      %8 = arith.muli %arg10, %c128_i32 : i32
      %9 = tpu.memref_slice %arg4[%arg0, %arg1, %8, %c0_i32] : memref<1x4x2048x128xbf16, #tpu.memory_space<any>> -> memref<1x1x128x128xbf16, #tpu.memory_space<any>>
      %10 = tpu.memref_squeeze %9 : memref<1x1x128x128xbf16, #tpu.memory_space<any>> -> memref<128x128xbf16, #tpu.memory_space<any>>
      %11 = tpu.memref_slice %arg7[%c0_i32, %c0_i32, %c0_i32] : memref<1x128x128xbf16, #tpu.memory_space<vmem>> -> memref<1x128x128xbf16, #tpu.memory_space<vmem>>
      %12 = tpu.memref_squeeze %11 : memref<1x128x128xbf16, #tpu.memory_space<vmem>> -> memref<128x128xbf16, #tpu.memory_space<vmem>>
      %13 = tpu.memref_slice %arg9[%c0_i32, %c0_i32] : memref<2x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      %14 = tpu.memref_squeeze %13 : memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      tpu.enqueue_dma source(%10 : memref<128x128xbf16, #tpu.memory_space<any>>) target(%12 : memref<128x128xbf16, #tpu.memory_space<vmem>>) target_semaphore(%14 : memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>)
      %15 = tpu.memref_slice %arg5[%arg0, %arg1, %8, %c0_i32] : memref<1x4x2048x128xbf16, #tpu.memory_space<any>> -> memref<1x1x128x128xbf16, #tpu.memory_space<any>>
      %16 = tpu.memref_squeeze %15 : memref<1x1x128x128xbf16, #tpu.memory_space<any>> -> memref<128x128xbf16, #tpu.memory_space<any>>
      %17 = tpu.memref_slice %arg8[%c0_i32, %c0_i32, %c0_i32] : memref<1x128x128xbf16, #tpu.memory_space<vmem>> -> memref<1x128x128xbf16, #tpu.memory_space<vmem>>
      %18 = tpu.memref_squeeze %17 : memref<1x128x128xbf16, #tpu.memory_space<vmem>> -> memref<128x128xbf16, #tpu.memory_space<vmem>>
      %19 = tpu.memref_slice %arg9[%c1_i32, %c0_i32] : memref<2x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      %20 = tpu.memref_squeeze %19 : memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      tpu.enqueue_dma source(%16 : memref<128x128xbf16, #tpu.memory_space<any>>) target(%18 : memref<128x128xbf16, #tpu.memory_space<vmem>>) target_semaphore(%20 : memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>)
      %21 = tpu.memref_slice %arg4[%arg0, %arg1, %8, %c0_i32] : memref<1x4x2048x128xbf16, #tpu.memory_space<any>> -> memref<1x1x128x128xbf16, #tpu.memory_space<any>>
      %22 = tpu.memref_squeeze %21 : memref<1x1x128x128xbf16, #tpu.memory_space<any>> -> memref<128x128xbf16, #tpu.memory_space<any>>
      %23 = tpu.memref_slice %arg7[%c0_i32, %c0_i32, %c0_i32] : memref<1x128x128xbf16, #tpu.memory_space<vmem>> -> memref<1x128x128xbf16, #tpu.memory_space<vmem>>
      %24 = tpu.memref_squeeze %23 : memref<1x128x128xbf16, #tpu.memory_space<vmem>> -> memref<128x128xbf16, #tpu.memory_space<vmem>>
      %25 = tpu.memref_slice %arg9[%c0_i32, %c0_i32] : memref<2x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      %26 = tpu.memref_squeeze %25 : memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      tpu.wait_dma2 semaphore(%26 : memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) src(%22 : memref<128x128xbf16, #tpu.memory_space<any>>) dst(%24 : memref<128x128xbf16, #tpu.memory_space<vmem>>)
      %27 = tpu.memref_slice %arg5[%arg0, %arg1, %8, %c0_i32] : memref<1x4x2048x128xbf16, #tpu.memory_space<any>> -> memref<1x1x128x128xbf16, #tpu.memory_space<any>>
      %28 = tpu.memref_squeeze %27 : memref<1x1x128x128xbf16, #tpu.memory_space<any>> -> memref<128x128xbf16, #tpu.memory_space<any>>
      %29 = tpu.memref_slice %arg8[%c0_i32, %c0_i32, %c0_i32] : memref<1x128x128xbf16, #tpu.memory_space<vmem>> -> memref<1x128x128xbf16, #tpu.memory_space<vmem>>
      %30 = tpu.memref_squeeze %29 : memref<1x128x128xbf16, #tpu.memory_space<vmem>> -> memref<128x128xbf16, #tpu.memory_space<vmem>>
      %31 = tpu.memref_slice %arg9[%c1_i32, %c0_i32] : memref<2x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      %32 = tpu.memref_squeeze %31 : memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      tpu.wait_dma2 semaphore(%32 : memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) src(%28 : memref<128x128xbf16, #tpu.memory_space<any>>) dst(%30 : memref<128x128xbf16, #tpu.memory_space<vmem>>)
      %33 = vector.load %arg7[%c0, %c0, %c0] : memref<1x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x128x128xbf16>
      %34 = vector.shape_cast %33 : vector<1x128x128xbf16> to vector<128x128xbf16>
      %35 = tpu.matmul %1, %34, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<128x128xbf16>, vector<128x128xbf16>, vector<128x128xf32> -> vector<128x128xf32>
      %36 = vector.load %arg8[%c0, %c0, %c0] : memref<1x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x128x128xbf16>
      %37 = vector.shape_cast %36 : vector<1x128x128xbf16> to vector<128x128xbf16>
      %38 = arith.mulf %35, %cst : vector<128x128xf32>
      %39 = vector.multi_reduction <maximumf>, %38, %cst_2 [1] : vector<128x128xf32> to vector<128xf32>
      %40 = vector.shape_cast %39 : vector<128xf32> to vector<128x1xf32>
      %41 = vector.broadcast %40 : vector<128x1xf32> to vector<128x128xf32>
      %42 = arith.maximumf %arg11, %41 : vector<128x128xf32>
      %43 = vector.extract_strided_slice %42 {offsets = [0, 0], sizes = [128, 1], strides = [1, 1]} : vector<128x128xf32> to vector<128x1xf32>
      %44 = vector.broadcast %43 : vector<128x1xf32> to vector<128x128xf32>
      %45 = arith.subf %38, %44 : vector<128x128xf32>
      %46 = math.exp %45 : vector<128x128xf32>
      %47 = arith.subf %arg11, %42 : vector<128x128xf32>
      %48 = math.exp %47 : vector<128x128xf32>
      %49 = arith.truncf %46 : vector<128x128xf32> to vector<128x128xbf16>
      %50 = arith.mulf %arg12, %48 : vector<128x128xf32>
      %51 = vector.multi_reduction <add>, %46, %cst_1 [1] : vector<128x128xf32> to vector<128xf32>
      %52 = vector.shape_cast %51 : vector<128xf32> to vector<128x1xf32>
      %53 = vector.broadcast %52 : vector<128x1xf32> to vector<128x128xf32>
      %54 = arith.addf %50, %53 : vector<128x128xf32>
      %55 = tpu.matmul %49, %37, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<128x128xbf16>, vector<128x128xbf16>, vector<128x128xf32> -> vector<128x128xf32>
      %56 = vector.extract_strided_slice %48 {offsets = [0, 0], sizes = [128, 1], strides = [1, 1]} : vector<128x128xf32> to vector<128x1xf32>
      %57 = vector.broadcast %56 : vector<128x1xf32> to vector<128x128xf32>
      %58 = arith.mulf %arg13, %57 : vector<128x128xf32>
      %59 = arith.addf %58, %55 : vector<128x128xf32>
      scf.yield %42, %54, %59 : vector<128x128xf32>, vector<128x128xf32>, vector<128x128xf32>
    }
    %3 = vector.extract_strided_slice %2#1 {offsets = [0, 0], sizes = [128, 1], strides = [1, 1]} : vector<128x128xf32> to vector<128x1xf32>
    %4 = vector.broadcast %3 : vector<128x1xf32> to vector<128x128xf32>
    %5 = arith.divf %2#2, %4 : vector<128x128xf32>
    %6 = arith.truncf %5 : vector<128x128xf32> to vector<128x128xbf16>
    %7 = vector.shape_cast %6 : vector<128x128xbf16> to vector<1x1x128x128xbf16>
    tpu.vector_store %arg6[%c0, %c0, %c0, %c0], %7 {strides = array<i32>} : memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x128x128xbf16>, 
    return
  }
  func.func @transform_0(%arg0: i32, %arg1: i32, %arg2: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_3(%arg0: i32, %arg1: i32, %arg2: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
}

